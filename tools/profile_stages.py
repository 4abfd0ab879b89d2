"""Per-stage device profile of the FastClassifier pipeline (PROFILE_r04).

Times each stage of the fused pipeline separately on a representative
chunk (block x W), with block_until_ready between stages, on whatever
index is given (toy bench index or the 100 Mbp scale index). This is the
per-op attribution VERDICT r3 weak #1 asked to be committed as an
artifact instead of buried in commit messages.

Usage: python tools/profile_stages.py [idx_dir] [n_reads] [W]
"""
from __future__ import annotations

import os
import sys
import time

R = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, R)
sys.path.insert(0, os.path.join(R, "tests"))


def timeit(fn, n=5):
    """block_until_ready through the axon tunnel returns before the
    computation actually finishes; device_get (a real D2H of the result)
    is the only reliable fence, so times below include one D2H."""
    import jax

    r = jax.device_get(fn())
    best = 1e9
    for _ in range(n):
        t0 = time.perf_counter()
        r = jax.device_get(fn())
        best = min(best, time.perf_counter() - t0)
    return best, r


def main():
    idx_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/desamba_scale/idx"
    n_reads = int(sys.argv[2]) if len(sys.argv) > 2 else 2048
    W = int(sys.argv[3]) if len(sys.argv) > 3 else 2048

    import jax
    import jax.numpy as jnp

    from desamba_tpu.engine import fast_engine as fe
    from desamba_tpu.engine.fast_engine import FastClassifier, stage0_unpack
    from desamba_tpu.index.format_ref import RefFormatIndex
    from desamba_tpu.io.fastx import read_fastx
    from desamba_tpu.oracle.classify import OracleIndex

    t0 = time.time()
    oi = OracleIndex(RefFormatIndex(idx_dir))
    cl = FastClassifier(oi, exact_fallback=False)
    print(f"load+init {time.time()-t0:.1f}s  L={oi.L}  "
          f"occ32 {cl.fm.occ32.size*4/1e6:.0f} MB  "
          f"pad {cl.fm.pad.size/1e6:.0f} MB  "
          f"w01 {cl.ek.w01.size*4/1e6:.0f} MB  "
          f"hash13 {cl.fm.hash13.size*4/1e6:.0f} MB", flush=True)

    # reads from the index's own genomes
    base = os.path.dirname(idx_dir)
    fa = os.path.join(base, "ref.fa")
    refs = [(r.name, r.seq) for r in read_fastx(fa)]
    from scale_data import make_reads_vec
    # cap below W: 10% error indels can grow a read ~3% past its draw
    reads = make_reads_vec(refs, seed=7, n_reads=n_reads,
                           read_len=(1_200, min(3_000, W * 9 // 10)),
                           err=0.10)

    packed_np, lens_np, _ = cl._encode(reads, W=W, Bp=n_reads)
    packed = jax.device_put(jnp.asarray(packed_np))
    lens = jax.device_put(jnp.asarray(lens_np))

    # full fused program first
    t_full, _ = timeit(lambda: cl._run(packed, lens))
    print(f"FULL fused: {t_full*1e3:.1f} ms  "
          f"({n_reads/t_full:.0f} reads/s)", flush=True)

    # Per-stage attribution WITHOUT tunnel-D2H pollution: jit cumulative
    # prefixes of the pipeline, each returning only tiny reductions of its
    # outputs; successive differences are the per-stage device costs.
    s1, s2, s3, s4 = fe._build_stages(
        cl.ek.lek, cl.ek.single_base_max, cl.ek.mask_bits, min_match=20,
        nw0=cl.ek.n_words0)
    K = 2 * fe._band(W) + 16

    def upto(n):
        def run(fm, loc, ra, w01, packed, lens):
            codes2, lengths2 = stage0_unpack(packed, lens)
            if n == 0:
                return codes2.astype(jnp.int32).sum()
            lo26, kidx, runlen, n_exist = s1(w01, codes2, lengths2)
            if n == 1:
                return lo26.sum() + kidx.sum() + runlen.sum()
            codes_i = codes2.astype(jnp.int32)
            r2 = s2(fm, codes_i, lengths2, lo26, kidx, runlen)
            if n == 2:
                return sum(x.sum().astype(jnp.int32) for x in r2)
            B2 = codes2.shape[0]
            nwR = kidx.shape[1] * fe.ROWS_PER_SEARCH
            r3 = s3(fm, loc, lengths2, *r2, B2=B2, nwR=nwR)
            if n == 3:
                return sum(x.sum() for x in r3)
            out = s4(ra, fe._read_words(packed), lengths2, *r3, B2=B2,
                     K=K)
            return sum(v.sum() for v in out.values())

        return jax.jit(run)

    prev = 0.0
    names = ["unpack", "probe+seeds", "FM search", "locate+vote",
             "band rescore"]
    for n in range(5):
        jf = upto(n)
        t, _ = timeit(lambda: jf(cl.fm, cl.loc, cl.ra, cl.ek.w01,
                                 packed, lens))
        print(f"stage{n} {names[n]}: cum {t*1e3:.1f} ms "
              f"(+{(t-prev)*1e3:.1f} ms)", flush=True)
        prev = t


if __name__ == "__main__":
    main()
