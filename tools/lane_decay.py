"""Measure live-lane decay per round in stage 2's FM interval search and
row walks on the real index (round-5 stage-2 design input).

TPU gathers are DMA-descriptor-bound (tools/gather_bench.py: sorted or
duplicate indices are no cheaper), so the cost of each lockstep round is
lanes_in_flight x gather_rate REGARDLESS of how many lanes are done —
the only wins are fewer rounds or fewer lanes (compaction). This prints
the live fraction after every round so the burst/compaction schedule
(IV_BURST / WALK_BURST / WALK_MID / WALK_TAIL, fast_engine.py) can be
fit to the actual decay instead of guessed.

Usage: python tools/lane_decay.py [idx_dir] [n_reads] [W]
"""
from __future__ import annotations

import os
import sys
import time

R = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, R)
sys.path.insert(0, os.path.join(R, "tests"))


def main():
    idx_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/desamba_tpu_bench/idx_100M"
    n_reads = int(sys.argv[2]) if len(sys.argv) > 2 else 2048
    W = int(sys.argv[3]) if len(sys.argv) > 3 else 2048

    import jax
    import jax.numpy as jnp
    import numpy as np

    from desamba_tpu.engine import fast_engine as fe
    from desamba_tpu.engine.fast_engine import FastClassifier, stage0_unpack
    from desamba_tpu.index.format_ref import RefFormatIndex
    from desamba_tpu.io.fastx import read_fastx
    from desamba_tpu.ops.fm import interval_search, row_walks
    from desamba_tpu.oracle.classify import OracleIndex
    from scale_data import make_reads_vec

    oi = OracleIndex(RefFormatIndex(idx_dir))
    cl = FastClassifier(oi, exact_fallback=False)
    fa = os.path.join(os.path.dirname(idx_dir), "ref.fa")
    refs = [(r.name, r.seq) for r in read_fastx(fa)]
    reads = make_reads_vec(refs, seed=7, n_reads=n_reads,
                           read_len=(1_200, min(3_000, W * 9 // 10)),
                           err=0.10)
    packed_np, lens_np, _ = cl._encode(reads, W=W, Bp=n_reads)
    packed = jax.device_put(jnp.asarray(packed_np))
    lens = jax.device_put(jnp.asarray(lens_np))

    s1, _, _, _ = fe._build_stages(
        cl.ek.lek, cl.ek.single_base_max, cl.ek.mask_bits, min_match=20,
        nw0=cl.ek.n_words0)

    @jax.jit
    def front(fm, w01, packed, lens):
        codes2, lengths2 = stage0_unpack(packed, lens)
        lo26, kidx, runlen, n_exist = s1(w01, codes2, lengths2)
        return codes2.astype(jnp.int32), lengths2, lo26, kidx, runlen

    codes_i, lengths2, lo26, kidx, runlen = jax.device_get(
        front(cl.fm, cl.ek.w01, packed, lens))
    codes_i = jax.device_put(jnp.asarray(codes_i))

    B2, Wd = codes_i.shape
    n_win = kidx.shape[1]
    S = B2 * n_win
    lane = np.repeat(np.arange(B2, dtype=np.int32), n_win)
    sk = kidx.reshape(S)
    rl = runlen.reshape(S)
    s_idx = (3 - 1) + 3 * sk + (cl.ek.lek - 1)
    seed_ok = (rl > 0) & (s_idx < lengths2[lane])
    pre = lo26[lane, sk]
    h13 = np.asarray(cl.fm.hash13)
    sp0 = np.where(seed_ok, h13[pre], 0).astype(np.int32)
    ep0 = np.where(seed_ok, h13[pre + 1], 0).astype(np.int32)
    print(f"S = {S} search lanes ({seed_ok.mean():.2%} seeded)", flush=True)

    max_rst = jnp.full(S, fe.ROWS_PER_SEARCH, jnp.int32)
    l_min = jnp.full(S, 20, jnp.int32)
    l_max = jnp.minimum(jnp.asarray(s_idx, jnp.int32), 13 + fe.FM_EXT_CAP)
    lane_j = jnp.asarray(lane)

    st = None
    print("interval_search live fraction per round:", flush=True)
    fr = []
    for r in range(28):
        st = interval_search(cl.fm, codes_i, 0, jnp.asarray(s_idx, jnp.int32),
                             jnp.asarray(sp0), jnp.asarray(ep0),
                             max_rst, l_min, l_max, lanes=lane_j,
                             max_steps=1, state=st, return_state=True)
        live = float(jnp.mean(~st["done"]))
        fr.append(live)
        if r < 16 or r % 4 == 0:
            print(f"  round {r+1:2d}: live {live:.4f}", flush=True)
        if live == 0:
            break

    # ---- walks: replicate stage2's row expansion on the final state ----
    res_sp = np.asarray(st["nsp"])
    res_ep = np.asarray(st["nep"])
    res_ptr = np.asarray(st["ptr"])
    ml0 = np.asarray(st["match_len"])
    srch_ok = np.asarray(seed_ok) & (res_sp < res_ep)
    Rr = fe.ROWS_PER_SEARCH
    rowk = np.arange(Rr, dtype=np.int32)
    rows = (res_sp[:, None] + rowk[None, :]).reshape(-1)
    rvalid = (srch_ok[:, None] & (
        res_sp[:, None] + rowk[None, :] < res_ep[:, None])).reshape(-1)
    lane_r = np.repeat(lane, Rr)
    ptr_r = np.repeat(res_ptr, Rr)
    rem_r = np.repeat(np.maximum(s_idx - ml0, 0), Rr)
    sel = np.nonzero(rvalid)[0]
    print(f"walk lanes: {sel.size} valid of {rows.size} "
          f"({sel.size/rows.size:.2%})", flush=True)
    wlens = jnp.asarray(rem_r[sel], jnp.int32)
    wlanes = jnp.asarray(lane_r[sel], jnp.int32)
    stw = None
    print("row_walks live fraction per round:", flush=True)
    for r in range(60):
        stw = row_walks(cl.fm, codes_i, jnp.asarray(rows[sel], jnp.int32),
                        jnp.asarray(ptr_r[sel], jnp.int32), wlens,
                        lanes=wlanes, with_trace=False, trace_cap=1,
                        state=stw, return_state=True)
        live = float(jnp.mean(~stw[3]))
        if r < 16 or r % 4 == 0:
            print(f"  round {r+1:2d}: live {live:.4f}", flush=True)
        if live == 0:
            break


if __name__ == "__main__":
    main()
