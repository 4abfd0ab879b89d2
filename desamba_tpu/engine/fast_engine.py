"""Fully device-resident batched classifier ("fast mode").

The north-star pipeline (BASELINE.json) as ONE device dispatch per read
batch (stages below fused into a single program, _build_full; through a
tunneled chip each dispatch costs a ~25 ms client round trip and the
split pipeline paid it 6x). The wire format is 2-bit packed, both
strands per read row (stage0_unpack docstring) — 4x less H2D than a
uint8 matrix:

  stage0  2-bit unpack of the per-read fwd|rc packed rows
  stage1  exist-filter probe + per-window top-seed selection
          (cly.c:1066-1155 / cly.c:1157-1229 analogs; ops/ekmer.py,
          ops/seeds.py)
  stage2  lockstep FM backward search from the 13-base hash head start +
          per-row walk extensions (cly.c:1383-1442 analog; ops/fm.py)
  stage3  SA-sample resolution, unitig->reference mapping (cly.c:466-491
          analog; ops/locate.py) and an EXACT windowed diagonal vote
          replacing host chaining (cly.c:200-322 analog): every anchor i
          scores sum_j w_j over anchors j with the same ref and
          |diag_i - diag_j| <= tol — a Hough vote with a window centered
          at each anchor, so no bucket-boundary splits and no hash
          collisions. Emits the top-2 distinct-ref candidates per strand.
  stage4  device rescoring of the candidates (get_score_M2 analog,
          cly.c:2816-2844): gather each candidate's diagonal-band
          reference window (ops/refwin.py) and run the banded match-block
          kernel (ops/matchblock.band_score_*) — the final score counts
          read positions starting a >= 9 bp exact match in the band,
          i.e. sum over band MEMs of (len - 8): the same unit the
          reference SDP accumulates into sum_score (cly.c:2330-2435).

(Historical note: in round 1 fusing the then-straight-line pipeline into
one jit hit a pathological XLA fusion — compile minutes, 100x runtime.
The current stages contain while_loops and scatter compactions that act
as scheduling barriers, and the fused program now compiles and runs at
split-pipeline speed, so the fusion is back on.)

Unlike engine/tpu_engine.py (bit-exact hybrid, host replay), this path
trades byte-identical SAM for throughput: results carry (ref, direction,
position, score) per read and are validated by agreement with the
reference's primary assignments on the full golden set including
1-2.8 kb 12-18%-error reads (tests/test_fast_engine.py). This is the
deployment path for abundance workloads where the taxonomic call, not
the SAM record, is the product.
"""
from __future__ import annotations

import os
from dataclasses import dataclass
from functools import partial

import numpy as np

from ..constants import (
    DEFAULT_FILTER_MIN_LENGTH,
    DEFAULT_MIN_SCORE,
    FILTER_MIN_SCORE_2G,
    FILTER_MIN_SCORE_SHORT_3G,
    NGS_MAX_READ_L,
    SEED_RANGE,
    SHORT_3G_READ_L,
    STEP_EK,
)


def _pow2(n: int, lo: int = 64) -> int:
    v = lo
    while v < n:
        v <<= 1
    return v


def _bucket(n: int, lo: int = 256) -> int:
    """Width bucket: pow2 up to 2048, then 1024 steps. Above 2 kb the
    pow2 ladder wastes real device time — a 2.2 kb read would pay a
    4096-wide lane through every stage; with 1024 steps it pays 3072.
    All widths stay multiples of 256 (band_score q_block) and 16 (the
    packed wire format)."""
    v = lo
    while v < n and v < 2048:
        v <<= 1
    if v >= n:
        return v
    return -(-n // 1024) * 1024


ROWS_PER_SEARCH = 2  # MEM_SEARCH_FAST (cly.c:1471)
FM_EXT_CAP = 28  # cap the lockstep interval search depth; per-row walks
                 # carry matches further — bounds the while-loop straggler
                 # cost: each straggler ROUND costs ~0.3 ms of dispatch
                 # overhead at scale regardless of lane count, and the max
                 # over ~20k lanes runs the loop to its cap nearly every
                 # chunk (was 48; intervals past 41 chars just shift their
                 # tail into the row walks)
REFPOS_PER_ANCHOR = 4   # occurrences expanded per anchor (cap; cly.c:842
                        # allows 50 — beyond 4 the vote rarely changes)
VOTE_TILE = 64          # anchors per pairwise-vote scan step
N_CAND = 3              # candidates per strand (top / far-diag / other-ref)
IV_BURST = 2            # lockstep interval-search steps before the first
                        # straggler compaction. Measured decay on the
                        # 100 Mbp community (tools/lane_decay.py): live
                        # lanes are 15% after round 1, 6.7% after round 2,
                        # 1.1% after round 10 — and a TPU gather costs the
                        # same for done lanes as live ones (DMA-bound), so
                        # full-width rounds are pure waste past round 2
IV_MID = 8              # second interval phase rounds (on the S/8 cut)
WALK_BURST = 12         # row-walk steps before compacting stragglers
WALK_MID = 16           # second walk phase rounds (on a 4x compaction)
WALK_TAIL = 32          # final walk phase rounds: total walk cap 60 — at
                        # long-read error rates the max anchor tail over
                        # ~3k surviving lanes hits ~60-80, so an uncapped
                        # tail ran ~70 serial gather rounds for anchors
                        # whose extra length almost never changes the vote
                        # (anchors are capped, not lost)


def _band(W: int) -> int:
    """Half-width of the stage-4 diagonal band. Indel diagonal drift is a
    random walk with per-base variance ~2*err/3; at 18% error and 4 kb this
    is sigma~22, so W>>5 covers >5 sigma. The SWAR banded scorer
    (band_score_packed) works on 16-code words, so the band-score K
    dimension (2*band + 16) only needs to be a 16 multiple — always true
    for these values — and the r2/r3 128-lane snap (which either collapsed
    coverage to ~3 sigma or doubled the compute, ADVICE r3) is gone."""
    return min(128, max(32, W >> 5))


def _enable_compile_cache():
    """Persistent XLA compile cache so each (W, B) bucket compiles once
    per machine, not once per process."""
    import jax

    d = os.path.expanduser("~/.cache/desamba_tpu_xla")
    os.makedirs(d, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", d)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass  # older jax: cache simply not persisted


def stage0_unpack(packed, lens):
    """Device-side decode of the wire format: packed uint8[Bp, W//2] —
    per READ row, W//4 bytes of forward codes then W//4 bytes of
    reverse-complement codes, 4 codes/byte little-endian (code j =
    (byte[j>>2] >> (2*(j&3))) & 3), zero-padded past lens. Returns
    (codes2 uint8[2Bp, W], lengths2 int32[2Bp]) — fwd rows then rc rows.

    2 bits/code keeps H2D 4x under the old uint8 matrix (the transfer is
    overlapped with compute by the dispatch-ahead pipeline anyway). The
    rc half is packed on the HOST: deriving it here needed a per-row
    variable-shift gather that measured ~45 ms per 2048x2048 chunk —
    the single most expensive op of the whole unpack path — while the
    host pays ~15 ms of numpy inside the overlapped encode. One row per
    read (not separate rc rows) so 'data'-sharding keeps a read's two
    strands on one shard with no host-side row interleave."""
    import jax.numpy as jnp

    Bp, Wq2 = packed.shape
    Wq = Wq2 // 2
    W = Wq * 4
    pos = jnp.arange(W, dtype=jnp.int32)
    both = jnp.concatenate([packed[:, :Wq], packed[:, Wq:]], axis=0)
    # repeat + per-column shift. (A static-shift-plane stack+reshape —
    # 4 shifts and an interleave — measured SLOWER on v5e: the [Bp, Wq, 4]
    # -> [Bp, W] reshape is a lane relayout.)
    b = jnp.repeat(both, 4, axis=1)
    codes2 = (b >> ((pos & 3) << 1).astype(jnp.uint8)) & 3
    lens = jnp.asarray(lens, jnp.int32)
    return codes2, jnp.concatenate([lens, lens])


def _read_words(packed):
    """uint32[2Bp, W/16] LSB-first packed code words, fwd rows then rc:
    the wire format (stage0_unpack docstring) already stores 4 codes per
    byte LSB-first, so the per-strand byte halves viewed as little-endian
    u32 put code t of each 16-code word at bits 2t — exactly the layout
    band_score_packed and RefArrays.ref_words_lsb use. Zero unpack cost:
    one bitcast."""
    import jax
    import jax.numpy as jnp

    Bp, Wq2 = packed.shape
    Wq = Wq2 // 2
    both = jnp.concatenate([packed[:, :Wq], packed[:, Wq:]], axis=0)
    return jax.lax.bitcast_convert_type(
        both.reshape(2 * Bp, Wq // 4, 4), jnp.uint32)


def _build_stages(lek: int, sbm: int, mask_bits: int, min_match: int,
                  nw0: int = 0):
    """Returns (stage1, stage2, stage3, stage4) closed over static ek
    params. Each stage is separately jit-able; chaining them keeps all
    intermediates on device."""
    import jax
    import jax.numpy as jnp

    from ..ops.ekmer import _probe_reads, kmer_lo26
    from ..ops.fm import interval_search, row_walks
    from ..ops.locate import expand_refpos, resolve_rows
    from ..ops.matchblock import band_score_packed
    from ..ops.seeds import top_seeds

    def stage1(w01, codes2, lengths2):
        """codes2: uint8[2B, W] (rows 0..B-1 fwd, B..2B-1 rc). Probes on
        the reference's STEP_EK grid (cly.c:969,979): bitmap gathers are
        the cost here, and the C itself only probes every 3rd k-mer."""
        ex = _probe_reads(w01, codes2, lengths2, lek, sbm, mask_bits,
                          stride=STEP_EK, n_words0=nw0)
        lo26 = kmer_lo26(codes2, lek, stride=STEP_EK)
        kidx, runlen = top_seeds(ex, SEED_RANGE // STEP_EK)  # [2B, n_win]
        n_exist = ex.sum(axis=1).astype(jnp.int32)
        return lo26, kidx, runlen, n_exist

    def stage2(fm, codes_i, lengths2, lo26, kidx, runlen):
        B2, W = codes_i.shape
        n_win = kidx.shape[1]
        S = B2 * n_win
        lane = jnp.repeat(jnp.arange(B2, dtype=jnp.int32), n_win)
        sk = kidx.reshape(S)  # stride-grid column of the window's top seed
        rl = runlen.reshape(S)
        s_idx = (STEP_EK - 1) + STEP_EK * sk + (lek - 1)
        seed_ok = (rl > 0) & (s_idx < lengths2[lane])
        pre = lo26[lane, sk]
        sp0 = jnp.where(seed_ok, fm.hash13[pre], 0)
        ep0 = jnp.where(seed_ok, fm.hash13[pre + 1], 0)
        # --- iterate-compact-iterate: the lockstep loop pays every lane's
        # occ gathers on EVERY iteration even after the lane breaks; most
        # lanes break within a few steps (the 13-char hash head start has
        # already narrowed the interval), so run a short burst on all S
        # lanes, compact the stragglers (~<=25%), and finish only those.
        max_rst_a = jnp.full(S, ROWS_PER_SEARCH, jnp.int32)
        l_min_a = jnp.full(S, min_match, jnp.int32)
        l_max_a = jnp.minimum(s_idx, 13 + FM_EXT_CAP)
        st = interval_search(
            fm, codes_i, 0, s_idx, sp0, ep0, max_rst_a, l_min_a, l_max_a,
            lanes=lane, max_steps=IV_BURST, return_state=True)
        live = ~st["done"]
        # first cut: S/8 (measured live after round 2 is ~6.7% — 1.9x
        # margin; lanes past the cap are truncated at their current
        # interval, same contract as before)
        NC2 = max(128, S // 8)
        pos2 = jnp.cumsum(live.astype(jnp.int32)) - 1
        tgt2 = jnp.where(live & (pos2 < NC2), pos2, NC2)
        sel2 = jnp.full(NC2, S, jnp.int32).at[tgt2].set(
            jnp.arange(S, dtype=jnp.int32), mode="drop")
        s2i = jnp.minimum(sel2, S - 1)
        st_c = {k: v[s2i] for k, v in st.items()}
        st_c["done"] = st_c["done"] | (sel2 >= S)
        mid_c = interval_search(
            fm, codes_i, 0, s_idx[s2i], sp0[s2i], ep0[s2i], max_rst_a[s2i],
            l_min_a[s2i], l_max_a[s2i], lanes=lane[s2i], state=st_c,
            max_steps=IV_MID, return_state=True)
        # second cut: S/32 (live after round 10 measured ~1.1% — 2.8x
        # margin) for the long tail to the 28-step cap
        live3 = ~mid_c["done"]
        NC3 = max(128, S // 32)
        pos3 = jnp.cumsum(live3.astype(jnp.int32)) - 1
        tgt3 = jnp.where(live3 & (pos3 < NC3), pos3, NC3)
        sel3 = jnp.full(NC3, NC2, jnp.int32).at[tgt3].set(
            jnp.arange(NC2, dtype=jnp.int32), mode="drop")
        s3i = jnp.minimum(sel3, NC2 - 1)
        st_c3 = {k: v[s3i] for k, v in mid_c.items()}
        st_c3["done"] = st_c3["done"] | (sel3 >= NC2)
        s2i3 = s2i[s3i]
        fin_c = interval_search(
            fm, codes_i, 0, s_idx[s2i3], sp0[s2i3], ep0[s2i3],
            max_rst_a[s2i3], l_min_a[s2i3], l_max_a[s2i3], lanes=lane[s2i3],
            state=st_c3, return_state=True)
        mid_f = {k: mid_c[k].at[sel3].set(fin_c[k], mode="drop")
                 for k in ("nsp", "nep", "match_len", "ptr", "status")}
        res = {k: st[k].at[sel2].set(mid_f[k], mode="drop")
               for k in ("nsp", "nep", "match_len", "ptr", "status")}
        res = dict(sp=res["nsp"], ep=res["nep"], match_len=res["match_len"],
                   ptr=res["ptr"], status=res["status"])
        ml0 = res["match_len"]  # chars matched before the break char
        # status 1 (depth cap / read start reached) is a hit here too —
        # the per-row walk below keeps extending from the recorded interval
        srch_ok = seed_ok & (res["sp"] < res["ep"])
        # per-row single-interval extension (bwt_single_search analog).
        # Only ~10-15% of lanes carry a live interval; compact them to the
        # front so the sequential LF walks here AND the SA resolution in
        # stage 3 gather NC lanes instead of S*R. The compaction is a
        # cumsum prefix-position scatter (O(n), stable) — an argsort would
        # cost a full device sort. Lanes past NC are only dropped if >NC
        # are valid — with NC = S*R/4 that needs >25% of all window seeds
        # to hit, far beyond real batches.
        R = ROWS_PER_SEARCH
        rowk = jnp.arange(R, dtype=jnp.int32)
        rows = (res["sp"][:, None] + rowk[None, :]).reshape(-1)
        rvalid = (srch_ok[:, None] & (
            res["sp"][:, None] + rowk[None, :] < res["ep"][:, None])
        ).reshape(-1)
        lane_r = jnp.repeat(lane, R)
        ptr_r = jnp.repeat(res["ptr"], R)
        rem_r = jnp.repeat(jnp.maximum(s_idx - ml0, 0), R)
        SR = S * R
        NC = max(256, SR // 4)
        pos = jnp.cumsum(rvalid.astype(jnp.int32)) - 1
        tgt = jnp.where(rvalid & (pos < NC), pos, NC)
        # invalid slots hold SR (out of range): gathers clamp + are masked
        # by sval, scatters in stage 3 drop them (mode='drop')
        sel = jnp.full(NC, SR, jnp.int32).at[tgt].set(
            jnp.arange(SR, dtype=jnp.int32), mode="drop")
        sval = sel < SR
        seli = jnp.minimum(sel, SR - 1)  # clamped for gathers; sval masks
        # walks, same two-phase shape: short burst on all NC lanes, then
        # finish the few still matching on an NC/4 compaction
        wlens = jnp.where(sval, rem_r[seli], 0)
        wlanes = lane_r[seli]
        stw = row_walks(fm, codes_i, rows[seli], ptr_r[seli], wlens,
                        lanes=wlanes, with_trace=False,
                        trace_cap=WALK_BURST, return_state=True)
        spw, ptrw, nw, donew, badw = stw
        livew = ~donew
        NCW = max(128, NC // 4)
        posw = jnp.cumsum(livew.astype(jnp.int32)) - 1
        tgtw = jnp.where(livew & (posw < NCW), posw, NCW)
        selw = jnp.full(NCW, NC, jnp.int32).at[tgtw].set(
            jnp.arange(NC, dtype=jnp.int32), mode="drop")
        swi = jnp.minimum(selw, NC - 1)
        stw_c = (spw[swi], ptrw[swi], nw[swi],
                 donew[swi] | (selw >= NC), badw[swi])
        # middle burst + second compaction: the tail of long walks
        # otherwise runs every iteration on NCW lanes when only a few
        # percent are still matching
        st2 = row_walks(fm, codes_i, stw_c[0], stw_c[1], wlens[swi],
                        lanes=wlanes[swi], with_trace=False, state=stw_c,
                        trace_cap=WALK_MID, return_state=True)
        sp2, ptr2, n2, done2, bad2 = st2
        live2 = ~done2
        NCW2 = max(128, NCW // 4)
        pos2w = jnp.cumsum(live2.astype(jnp.int32)) - 1
        tgt2w = jnp.where(live2 & (pos2w < NCW2), pos2w, NCW2)
        selw2 = jnp.full(NCW2, NCW, jnp.int32).at[tgt2w].set(
            jnp.arange(NCW, dtype=jnp.int32), mode="drop")
        swi2 = jnp.minimum(selw2, NCW - 1)
        st2_c = (sp2[swi2], ptr2[swi2], n2[swi2],
                 done2[swi2] | (selw2 >= NCW), bad2[swi2])
        wrc = row_walks(fm, codes_i, st2_c[0], st2_c[1], wlens[swi][swi2],
                        lanes=wlanes[swi][swi2], with_trace=False,
                        state=st2_c, trace_cap=WALK_TAIL)
        n_mid = n2.at[selw2].set(wrc["steps"], mode="drop")
        sp_mid = sp2.at[selw2].set(wrc["final_sp"], mode="drop")
        bad_mid = bad2.at[selw2].set(wrc["bad_char"], mode="drop")
        steps = nw.at[selw].set(n_mid, mode="drop")
        final_sp = spw.at[selw].set(sp_mid, mode="drop")
        badw = badw.at[selw].set(bad_mid, mode="drop")
        total_c = jnp.repeat(ml0, R)[seli] + 1 + steps
        hit_c = sval & (total_c >= min_match) & ~badw
        qleft_c = jnp.repeat(s_idx, R)[seli] - total_c + 1
        # all [NC]-compacted; sel maps back to the (seed-window, row) grid
        return final_sp, hit_c, total_c, qleft_c, sel

    def stage3(fm, loc, lengths2, fsp_c, hit_c, total_c, qleft_c, sel,
               B2: int, nwR: int):
        """Anchor resolution + exact windowed diagonal vote, on the
        [NC]-compacted lanes from stage 2. `nwR` = n_win * R = the
        per-read lane-grid size; sel // nwR recovers the read row and
        sel % nwR the anchor slot for the dense [B2, A] vote layout."""
        loc_r = resolve_rows(fm, loc, fsp_c, hit_c)
        ref, gpos, pvalid = expand_refpos(
            loc, loc_r["uni"], loc_r["u_off"], loc_r["ok"],
            P=REFPOS_PER_ANCHOR)  # [NC, P]
        P = ref.shape[1]
        A = nwR * P
        b_i = sel // nwR                      # [NC]; == B2 for dropped slots
        slot = (sel % nwR)[:, None] * P + jnp.arange(P, dtype=jnp.int32)
        ref_a = jnp.full((B2, A), -1, jnp.int32).at[b_i[:, None], slot].set(
            jnp.where(pvalid, ref, -1), mode="drop")
        diag_a = jnp.zeros((B2, A), jnp.int32).at[b_i[:, None], slot].set(
            gpos - qleft_c[:, None], mode="drop")
        w_a = jnp.zeros((B2, A), jnp.int32).at[b_i[:, None], slot].set(
            jnp.where(pvalid, total_c[:, None], 0), mode="drop")
        tol = jnp.clip(lengths2 >> 4, 30, 160)[:, None, None]  # per lane

        # pairwise windowed vote, scanned over j-tiles to bound memory:
        # score[b, i] = sum_j w[b, j] * [ref eq & |diag diff| <= tol]
        Ap = -(-A // VOTE_TILE) * VOTE_TILE
        refp = jnp.pad(ref_a, ((0, 0), (0, Ap - A)), constant_values=-2)
        diagp = jnp.pad(diag_a, ((0, 0), (0, Ap - A)))
        wp = jnp.pad(w_a, ((0, 0), (0, Ap - A)))

        def vstep(score, j0):
            rj = jax.lax.dynamic_slice(refp, (0, j0), (B2, VOTE_TILE))
            dj = jax.lax.dynamic_slice(diagp, (0, j0), (B2, VOTE_TILE))
            wj = jax.lax.dynamic_slice(wp, (0, j0), (B2, VOTE_TILE))
            same = (ref_a[:, :, None] == rj[:, None, :]) & (
                jnp.abs(diag_a[:, :, None] - dj[:, None, :]) <= tol)
            return score + (same * wj[:, None, :]).sum(axis=2,
                                                       dtype=jnp.int32), None

        score0 = jnp.zeros((B2, A), jnp.int32)
        j0s = jnp.arange(0, Ap, VOTE_TILE, dtype=jnp.int32)
        score, _ = jax.lax.scan(vstep, score0, j0s)
        score = jnp.where(ref_a >= 0, score, -1)

        rows_i = jnp.arange(B2, dtype=jnp.int32)

        def take(sc):
            i1 = jnp.argmax(sc, axis=1)
            v1 = sc[rows_i, i1]
            r1 = jnp.where(v1 > 0, ref_a[rows_i, i1], -1)
            return r1, diag_a[rows_i, i1], jnp.maximum(v1, 0)

        # three candidates per strand: the winner; the best on a FAR
        # diagonal (another chain of a boundary-spanning read — the
        # reference keeps these as separate chains, cly.c:200-223); the
        # best with a DIFFERENT ref (the runner-up genome the rescore
        # must adjudicate, delete_small_score_rst's cross-ref compare)
        r1, d1, v1 = take(score)
        far = (ref_a != r1[:, None]) | (
            jnp.abs(diag_a - d1[:, None]) > 2 * tol[:, :, 0])
        r2, d2, v2 = take(jnp.where(far, score, -1))
        r3, d3, v3 = take(jnp.where(ref_a != r1[:, None], score, -1))
        ref_c = jnp.stack([r1, r2, r3], axis=1)   # [B2, N_CAND]
        diag_c = jnp.stack([d1, d2, d3], axis=1)
        vote_c = jnp.stack([v1, v2, v3], axis=1)
        return ref_c, diag_c, vote_c

    def stage4(ra, read_w2, lengths2, ref_c, diag_c, vote_c, B2: int,
               K: int):
        """Banded rescore of every candidate; strand+candidate combine.

        read_w2: uint32[B2, W/16] LSB-first packed read codes (the wire
        bytes of both strands viewed <u4 — see _read_words). K here is
        the FULL band-score width Kp = 2*band + 16: the band start is
        aligned down to a 16-code word boundary and widened by the
        worst-case 16-code slack, so the word gather needs no per-lane
        shifts and coverage is >= +-band at any alignment."""
        W = 16 * read_w2.shape[1]
        C = ref_c.shape[1]
        band = (K - 16) // 2
        ref_f = ref_c.reshape(-1)          # [B2*C]
        diag_f = diag_c.reshape(-1)
        lane_f = jnp.repeat(jnp.arange(B2, dtype=jnp.int32), C)
        g0a = (diag_f - band) & ~15
        nw = W // 16 + K // 16 + 1
        total_w = ra.ref_words_lsb.shape[0]
        widx = (g0a >> 4)[:, None] + jnp.arange(nw, dtype=jnp.int32)[None, :]
        win_w = ra.ref_words_lsb[jnp.clip(widx, 0, total_w - 1)]
        NREF0 = ra.ref_offset.shape[0]
        rc0 = jnp.clip(ref_f, 0, NREF0 - 1)
        lo = ra.ref_offset[rc0]
        hi = lo + ra.ref_len[rc0]
        ok = ref_f >= 0
        rel_lo = jnp.where(ok, lo - g0a, 0)
        rel_hi = jnp.where(ok, hi - g0a, 0)
        bs = band_score_packed(read_w2[lane_f], lengths2[lane_f], win_w,
                               rel_lo, rel_hi, K=K)
        B = B2 // 2

        def fold(x):  # [B2, C] -> [B, 2C]: fwd candidates then rc
            return jnp.concatenate([x[:B], x[B:]], axis=1)

        score4 = fold(bs["score"].reshape(B2, C))
        q_st = fold(bs["q_st"].reshape(B2, C))
        q_ed = fold(bs["q_ed"].reshape(B2, C))
        ref2 = fold(ref_c)
        diag2 = fold(diag_c)
        score4 = jnp.where(ref2 >= 0, score4, -1)
        # the reference's tie order: final sort is chain_cmp_by_MEM_score
        # after the pos sort (ascending ref_ID); on equal scores it returns
        # sum_score % 2 (cly.c:62) — under glibc's stable mergesort an ODD
        # score reverses tied runs (highest ref_ID first), an EVEN score
        # keeps them (lowest ref_ID first). Reproduced exactly.
        s_max = score4.max(axis=1)
        odd = (s_max & 1) == 1
        at_max = score4 == s_max[:, None]
        NREF = ra.ref_offset.shape[0]
        r_hi = jnp.where(at_max, ref2, -1).max(axis=1)
        r_lo = jnp.where(at_max, ref2, NREF + 1).min(axis=1)
        r_best = jnp.where(odd, r_hi, r_lo)
        chosen = at_max & (ref2 == r_best[:, None])
        cb = jnp.argmax(chosen, axis=1)  # first matching candidate
        rows_b = jnp.arange(B, dtype=jnp.int32)
        ref_b = jnp.where(s_max > 0, ref2[rows_b, cb], -1)
        rc = jnp.clip(ref_b, 0, NREF - 1)
        pos = diag2[rows_b, cb] + q_st[rows_b, cb] - ra.ref_offset[rc]
        # cross-ref runner-up score: how close the best OTHER genome came
        # (drives the speculative exact-replay of ambiguous reads)
        other = (ref2 != ref_b[:, None]) & (ref2 >= 0)
        score_alt = jnp.where(other, score4, -1).max(axis=1)
        return dict(
            score=jnp.maximum(s_max, 0),
            ref=ref_b,
            direction=jnp.where(cb >= C, 0, 1),  # 1 = forward (cly.h)
            cov=jnp.maximum(q_ed[rows_b, cb] - q_st[rows_b, cb], 0),
            pos=jnp.where(ref_b >= 0, pos, -1),
            score_alt=jnp.maximum(score_alt, 0),
        )

    return stage1, stage2, stage3, stage4


def _build_full(lek: int, sbm: int, mask_bits: int, min_match: int,
                nw0: int = 0):
    """The whole pipeline (stage0 unpack + stages 1-4 + result pack) as ONE
    program: through a tunneled/remote chip every dispatch costs a ~25 ms
    client round trip, so 6 dispatches/chunk were pure overhead. The old
    pathological-fusion concern (module docstring r1) no longer applies:
    stages 2/3 now contain while_loops and scatter compactions that act as
    scheduling barriers, and the fused program compiles and runs at the
    same per-stage speed as the split one (measured on v5e)."""
    import jax.numpy as jnp

    s1, s2, s3, s4 = _build_stages(lek, sbm, mask_bits, min_match, nw0)

    def full(fm, loc, ra, w01, packed, lens):
        codes2, lengths2 = stage0_unpack(packed, lens)
        lo26, kidx, runlen, n_exist = s1(w01, codes2, lengths2)
        codes_i = codes2.astype(jnp.int32)
        fsp, hit, tot, qleft, sel = s2(fm, codes_i, lengths2, lo26, kidx,
                                       runlen)
        B2 = codes2.shape[0]
        nwR = kidx.shape[1] * ROWS_PER_SEARCH
        ref_c, diag_c, vote_c = s3(fm, loc, lengths2, fsp, hit, tot, qleft,
                                   sel, B2=B2, nwR=nwR)
        W = codes2.shape[1]
        out = s4(ra, _read_words(packed), lengths2, ref_c, diag_c, vote_c,
                 B2=B2, K=2 * _band(W) + 16)
        B = B2 // 2
        ne = n_exist[:B] + n_exist[B:]
        return jnp.stack([out[k] for k in PACK_KEYS] + [ne])

    return full


@dataclass
class FastResult:
    name: str
    ref_ID: int      # -1 = unclassified
    direction: int
    score: int       # band-MEM score (reference sum_score scale)
    read_len: int
    pos: int = -1    # 0-based position in the reference (approximate)


def _score_threshold(read_len: int, filter_min_score: int,
                     filter_min_length: int) -> tuple[int, int]:
    """Per-read analog of the reference's final filter ladder
    (delete_small_score_rst, cly.c:2955-2981): returns (thr, long_thr)
    where a read is kept if score' >= thr, or — for long reads — if
    score' >= filter_min_score and coverage >= filter_min_length
    (score' = sum_score + (cov >> 5))."""
    if read_len < SHORT_3G_READ_L:
        return FILTER_MIN_SCORE_SHORT_3G, 0
    if read_len < NGS_MAX_READ_L:
        return FILTER_MIN_SCORE_2G, 0
    return filter_min_score + 10, filter_min_score


# packed result-row order: one [7, Bp] int32 array leaves the device per
# chunk (a SINGLE D2H — on latency-bound interconnects like a tunneled chip
# every separate fetch costs ~10s of ms, so the 7 per-read outputs are
# stacked on device and fetched together; row 6 = strand-folded n_exist)
PACK_KEYS = ("score", "ref", "direction", "cov", "pos", "score_alt")


_PACK7 = None


def _pack7():
    """Jitted [7, Bp] result pack for callers that run the stages
    separately (the sharded engine); `full` packs inline."""
    global _PACK7
    if _PACK7 is None:
        import jax
        import jax.numpy as jnp

        _PACK7 = jax.jit(
            lambda out, ne: jnp.stack([out[k] for k in PACK_KEYS] + [ne]))
    return _PACK7


def _unpack_rows(arr: "np.ndarray", B: int) -> dict:
    """Inverse of the device-side pack ([7, Bp] int32)."""
    res = {k: arr[i, :B] for i, k in enumerate(PACK_KEYS)}
    res["n_exist"] = arr[6, :B]
    return res


AMB_MARGIN = 8       # cross-ref score gap below which a read is replayed
                     # (the reference merges chains within +5 of each other,
                     # cly.c:2913-2952, so gaps this small are tie-order
                     # territory the approximate score cannot adjudicate)
AMB_MARGIN_LARGE = 24  # auto default once the index exceeds AMB_LARGE_L
                     # rows: bigger communities put more near-homologous
                     # genomes in range, so borderline votes need a wider
                     # replay margin. Measured at 412M rows / 376 genomes:
                     # margin 8 -> 0.9885 vs-native agreement, margin 24 ->
                     # 0.9905 at the same throughput (fallback 5% -> 9%,
                     # fully overlapped by the replay worker)
AMB_LARGE_L = 1 << 27
AMB_MIN_EXIST = 1    # unclassified reads with >= this many exist-kmer hits
                     # on the STEP_EK probe grid get a replay (the
                     # reference's slow path may still anchor them,
                     # cly.c:3098-3122); 1 stride hit ~ 3 dense k-mers


class FastClassifier:
    """Resident-index batched TPU classifier (throughput mode).

    Classification is gated by the reference's final-filter thresholds
    (delete_small_score_rst, cly.c:2955-2981) applied to the stage-4
    band-MEM score, which lands on the same sum_score scale.

    With exact_fallback=True (default), reads the device pipeline cannot
    call unambiguously — near-tied cross-genome scores, threshold-border
    scores, or exist-kmer seeds that produced no anchors — are replayed
    through the bit-exact native engine (the same speculate-then-verify
    split the reference uses between fast_classify and slow_classify,
    cly.c:3098-3122). The replay fraction is tracked in .stats."""

    def __init__(self, oi, min_score: int = DEFAULT_MIN_SCORE,
                 filter_min_length: int = DEFAULT_FILTER_MIN_LENGTH,
                 mesh=None, exact_fallback: bool = True,
                 fallback_threads: int | None = None,
                 max_width: int = 8192, amb_margin: int | None = None):
        if amb_margin is None:
            amb_margin = (AMB_MARGIN if oi.L < AMB_LARGE_L
                          else AMB_MARGIN_LARGE)
        _enable_compile_cache()
        import jax

        from ..index.tensor_index import from_oracle_index
        from ..ops.ekmer import EkArrays
        from ..ops.fm import FmArrays
        from ..ops.locate import LocArrays
        from ..ops.refwin import RefArrays

        self.oi = oi
        ti = from_oracle_index(oi)
        self.fm = FmArrays(ti)
        # fold big exist filters into the fast gather tier (EkArrays
        # docstring); the exact-replay fallback keeps the unfolded filter
        self.ek = EkArrays(ti, fold_bits="auto")
        self.loc = LocArrays(ti)
        self.ra = RefArrays(ti)
        self.min_score = min_score
        self.filter_min_length = filter_min_length
        self._full = jax.jit(_build_full(
            self.ek.lek, self.ek.single_base_max, self.ek.mask_bits,
            min_match=20, nw0=self.ek.n_words0))
        self._code = np.full(256, 1, np.uint8)
        for j, b in enumerate(b"ACGT"):
            self._code[b] = j
        for j, b in enumerate(b"acgt"):
            self._code[b] = j
        self.mesh = mesh
        if mesh is not None:
            self._shard_stages(mesh)
        self.exact_fallback = exact_fallback
        self.amb_margin = amb_margin
        self.max_width = max_width
        self._fallback_threads = fallback_threads or min(
            8, os.cpu_count() or 1)
        self._native = None  # built lazily on first ambiguous read
        import threading

        self._replay_lock = threading.Lock()  # replay runs on a worker
        self.stats = dict(n_reads=0, n_fallback=0)

    def _run(self, packed, lens):
        """Single-device ONE-dispatch pipeline: unpack+RC, stages 1-4 and
        the result pack fused into one program (see _build_full)."""
        return self._full(self.fm, self.loc, self.ra, self.ek.w01,
                          packed, lens)

    def _shard_stages(self, mesh):
        """Data-parallel variant: reads sharded over 'data', index
        replicated (SURVEY.md section 2.2). The fused program runs
        shard-locally — each shard unpacks its own packed rows, derives
        both strands (so strand pairs are shard-local by construction)
        and emits its [7, Bl] result slice; the global [7, Bp] array is
        already in original read order."""
        import jax
        from jax import shard_map
        from jax.sharding import NamedSharding, PartitionSpec as P

        full = _build_full(self.ek.lek, self.ek.single_base_max,
                           self.ek.mask_bits, min_match=20,
                           nw0=self.ek.n_words0)
        fm_specs = jax.tree_util.tree_map(lambda _: P(), self.fm)
        loc_specs = jax.tree_util.tree_map(lambda _: P(), self.loc)
        ra_specs = jax.tree_util.tree_map(lambda _: P(), self.ra)
        self._smfull = jax.jit(shard_map(
            full, mesh=mesh,
            in_specs=(fm_specs, loc_specs, ra_specs, P(),
                      P("data"), P("data")),
            out_specs=P(None, "data"), check_vma=False))
        self._smesh = mesh
        repl = NamedSharding(mesh, P())
        self._fm_r = jax.tree_util.tree_map(
            partial(jax.device_put, device=repl), self.fm)
        self._loc_r = jax.tree_util.tree_map(
            partial(jax.device_put, device=repl), self.loc)
        self._ra_r = jax.tree_util.tree_map(
            partial(jax.device_put, device=repl), self.ra)
        self._w01_r = jax.device_put(self.ek.w01, repl)

    def _run_mesh(self, packed, lens):
        import jax
        from jax.sharding import NamedSharding, PartitionSpec as P

        data = NamedSharding(self.mesh, P("data"))
        if jax.process_count() > 1:
            # multi-host data mesh (SURVEY.md section 2.3): every process
            # encodes the same global batch deterministically and
            # contributes the row block its devices own ('data' rows are
            # process-major in make_mesh device order). The caller reads
            # its addressable result shards (tests/dist_pipeline_worker.py
            # is the 2-process harness).
            np_, pid = jax.process_count(), jax.process_index()
            Bp = packed.shape[0]
            lo, hi = pid * Bp // np_, (pid + 1) * Bp // np_
            packed = jax.make_array_from_process_local_data(
                data, packed[lo:hi], (Bp, packed.shape[1]))
            lens = jax.make_array_from_process_local_data(
                data, lens[lo:hi], (Bp,))
        else:
            packed = jax.device_put(packed, data)
            lens = jax.device_put(lens, data)
        return self._smfull(self._fm_r, self._loc_r, self._ra_r,
                            self._w01_r, packed, lens)

    # ------------------------------------------------------------ encode --
    def _encode(self, reads, W: int | None = None, Bp: int | None = None):
        """Vectorized encode into the 2-bit wire format (see stage0_unpack)
        in shape buckets (pow2 width AND row count) so batches of any size
        reuse one compiled pipeline per bucket. One byte-table lookup over
        the concatenated batch — no per-read Python inner work beyond a
        row memcpy (the kt_pipeline step-0 analog must keep pace with the
        device, VERDICT r1 weak #9). W/Bp pin the bucket shape so callers
        can hold the set of compiled programs fixed across chunks.

        Returns (packed uint8[Bp, W//2], lens_p int32[Bp], lens int32[B]):
        per read row, fwd codes then rc codes, 2-bit packed (see
        stage0_unpack)."""
        lens = np.array([len(r[1]) for r in reads], np.int32)
        if W is None:
            W = _bucket(max(int(lens.max()), self.ek.lek + 2))
        B = len(reads)
        if Bp is None:
            Bp = _pow2(B, 8)
        flat = self._code[np.frombuffer(
            b"".join(r[1] for r in reads), np.uint8)]
        inv = 3 - flat
        off = np.concatenate([[0], np.cumsum(lens, dtype=np.int64)])
        codes = np.zeros((Bp, 2 * W), np.uint8)
        # per-read row fills: contiguous memcpy per read beats a 2D fancy
        # scatter with [total_bp] int64 index arrays ~6x at these shapes
        for i in range(B):
            o0, o1 = off[i], off[i + 1]
            codes[i, : o1 - o0] = flat[o0:o1]
            codes[i, W : W + o1 - o0] = inv[o0:o1][::-1]
        packed = (codes[:, 0::4] | (codes[:, 1::4] << 2)
                  | (codes[:, 2::4] << 4) | (codes[:, 3::4] << 6))
        lens_p = np.zeros(Bp, np.int32)
        lens_p[:B] = lens
        return packed, lens_p, lens

    # ----------------------------------------------------------- classify --
    def classify_batch(self, reads, block: int = 512) -> list[FastResult]:
        """Pipelined batch classify — the kt_pipeline analog
        (lib/kthread.c:157-197): encode chunk i+1 and format chunk i-1 on
        the host while chunk i computes on device (JAX dispatch is async;
        only the drain's np.asarray blocks). Reads are grouped into pow2
        width buckets first so a 1 kb read never pays a 4 kb lane; row
        count is pinned to `block` so each bucket compiles exactly once."""
        from concurrent.futures import ThreadPoolExecutor

        out: list = [None] * len(reads)
        by_bucket: dict[int, list[int]] = {}
        long_ids: list[int] = []
        for i, r in enumerate(reads):
            if len(r[1]) > self.max_width:
                long_ids.append(i)  # block-partitioned separately below
                continue
            Wb = _bucket(max(len(r[1]), self.ek.lek + 2))
            by_bucket.setdefault(Wb, []).append(i)
        pending: list = []
        # exact replays run on a worker thread (step-2 of the kt_pipeline
        # analog): the native engine releases the GIL, so ambiguous reads
        # from chunk i adjudicate WHILE chunks i+1.. compute on device
        replay_ex = ThreadPoolExecutor(max_workers=1) \
            if self.exact_fallback else None
        replay_futs: list = []

        def drain():
            sub, chunk, lens, handles = pending.pop(0)
            res = _unpack_rows(np.asarray(handles), len(chunk))
            frs, replay = self._format(chunk, lens, res)
            for j, fr in zip(sub, frs):
                out[j] = fr
            if replay:
                idxs = [sub[k] for k, _ in replay]
                rds = [r for _, r in replay]
                replay_futs.append(
                    (idxs, replay_ex.submit(self._replay, rds)))

        try:
            for Wb in sorted(by_bucket):
                ids = by_bucket[Wb]
                for s0 in range(0, len(ids), block):
                    sub = ids[s0 : s0 + block]
                    chunk = [reads[i] for i in sub]
                    # full chunks pin Bp=block (one compiled shape); a
                    # partial tail drops to its own pow2 so 100 leftover
                    # reads don't pay a full block's device time (at most
                    # log2(block) tail shapes ever compile)
                    Bp = block if len(sub) == block else _pow2(len(sub), 8)
                    if self.mesh is not None:
                        n_data = self.mesh.shape["data"]
                        Bp += (-Bp) % n_data  # rows must split over 'data'
                    handles, lens = self._dispatch_chunk(chunk, Wb, Bp)
                    pending.append((sub, chunk, lens, handles))
                    while len(pending) > 1:
                        drain()
            while pending:
                drain()
            if long_ids:
                self._classify_long(reads, long_ids, out, block)
            for idxs, fut in replay_futs:
                for i, fr in zip(idxs, fut.result()):
                    out[i] = fr
        finally:
            if replay_ex is not None:
                replay_ex.shutdown(wait=True)
        return out

    # ------------------------------------------------- very long reads --
    # Reads beyond max_width are classified by BLOCK PARTITIONING (the
    # sequence-parallel analog of SURVEY.md section 5 "long-context"): the
    # read is cut into max_width segments overlapping by LONG_OVERLAP, each
    # segment runs through the same device pipeline, and per-segment scores
    # are summed per genome — valid because the band-MEM score counts read
    # positions starting a >= 9 bp match, which is additive over the read
    # (the reference instead carries its chains across the whole read,
    # cly.c:200-322; a segment boundary can split one MEM, costing <= 8
    # score units per cut, and overlap regions count twice — both effects
    # are inside the AMB_MARGIN exact-replay guard).
    LONG_OVERLAP = 512

    def _classify_long(self, reads, ids, out, block):
        SEG = self.max_width
        OV = self.LONG_OVERLAP
        seg_of: dict[int, list[int]] = {}
        segs: list = []  # (read_idx, seg_start, (name, segseq, None))
        for i in ids:
            name, seq, _q = reads[i]
            L = len(seq)
            starts = list(range(0, L - SEG, SEG - OV)) + [L - SEG]
            seg_of[i] = starts
            for s0 in starts:
                segs.append((i, s0, (name, seq[s0 : s0 + SEG], None)))
        rows: dict = {}
        pending: list = []

        def drain():
            sub, handles = pending.pop(0)
            arr = np.asarray(handles)
            res = _unpack_rows(arr, len(sub))
            for j, (ri, ss, _) in enumerate(sub):
                rows[(ri, ss)] = {k: int(v[j]) for k, v in res.items()}

        Wb = _bucket(SEG)
        for c0 in range(0, len(segs), block):
            sub = segs[c0 : c0 + block]
            chunk = [s[2] for s in sub]
            Bp = block if len(sub) == block else _pow2(len(sub), 8)
            if self.mesh is not None:
                Bp += (-Bp) % self.mesh.shape["data"]
            handles, _lens = self._dispatch_chunk(chunk, Wb, Bp)
            pending.append((sub, handles))
            while len(pending) > 1:
                drain()
        while pending:
            drain()

        replay = []
        self.stats["n_reads"] += len(ids)
        for i in ids:
            name, seq, qual = reads[i]
            L = len(seq)
            acc: dict[int, int] = {}
            cov: dict[int, int] = {}
            dirv: dict[tuple, int] = {}
            best_pos: dict[int, tuple] = {}  # rid -> (seg score, read pos)
            n_exist = 0
            alt_floor = 0  # SUM of per-segment other-genome scores: a
            # genome that narrowly loses every segment appears only in
            # score_alt, so the per-segment sum is the conservative bound
            # on its total (ADVICE r3 — over-triggering replay is safe,
            # under-triggering miscalls)
            for ss in seg_of[i]:
                row = rows[(i, ss)]
                n_exist += row["n_exist"]
                alt_floor += row["score_alt"]
                rid = row["ref"]
                if rid >= 0 and row["score"] > 0:
                    acc[rid] = acc.get(rid, 0) + row["score"]
                    cov[rid] = cov.get(rid, 0) + row["cov"]
                    dirv[(rid, row["direction"])] = dirv.get(
                        (rid, row["direction"]), 0) + row["score"]
                    # read-level pos from the BEST-scoring segment; for a
                    # reverse-complement hit the segment at read offset ss
                    # sits at offset L-SEG-ss of the aligned (rc) strand
                    # (ADVICE r3)
                    s_off = ss if row["direction"] == 1 else L - SEG - ss
                    cand = (row["score"], max(row["pos"] - s_off, 0))
                    if rid not in best_pos or cand > best_pos[rid]:
                        best_pos[rid] = cand
            if acc:
                rid = max(acc, key=lambda r: (acc[r], -r))
                sc = acc[rid]
                second = max([v for r, v in acc.items() if r != rid],
                             default=0)
                second = max(second, alt_floor)
                cv = cov[rid]
                eff = sc + (cv >> 5)
                thr, long_thr = _score_threshold(
                    L, self.min_score, self.filter_min_length)
                ok = eff >= thr or (long_thr and eff >= long_thr
                                    and cv >= self.filter_min_length)
                d = max((k for k in dirv if k[0] == rid),
                        key=lambda k: dirv[k])[1]
                ambiguous = (ok and sc - second <= self.amb_margin) or (
                    not ok and eff >= thr - self.amb_margin)
            else:
                rid, sc, d, ok = -1, 0, 0, False
                ambiguous = n_exist >= AMB_MIN_EXIST
            if self.exact_fallback and ambiguous:
                replay.append(i)
                continue
            out[i] = FastResult(
                name=name, ref_ID=rid if ok else -1,
                direction=d if ok else 0, score=sc, read_len=L,
                pos=best_pos[rid][1] if (ok and rid in best_pos) else -1)
        if replay:
            self.stats["n_fallback"] += len(replay)
            for i, fr in zip(replay, self._replay([reads[i] for i in replay])):
                out[i] = fr

    def _dispatch_chunk(self, reads, W=None, Bp=None):
        """Encode + launch the device pipeline; returns (packed [7, Bp]
        device array, lens) without forcing a sync. Result rows are in
        original read order in both single-device and mesh modes (each
        data shard derives its own strand pair, so no row interleave)."""
        packed, lens_p, lens = self._encode(reads, W=W, Bp=Bp)
        if self.mesh is not None:
            assert packed.shape[0] % self.mesh.shape["data"] == 0, \
                "pow2 bucket must divide mesh size"
            return self._run_mesh(packed, lens_p), lens
        return self._run(packed, lens_p), lens

    def _format(self, reads, lens, res):
        """Format one chunk's device rows. Returns (results, replay):
        replay is the list of (local index, read) this chunk could not
        call unambiguously — the CALLER replays them (classify_batch
        overlaps the replay with the remaining device chunks)."""
        out = []
        replay = []  # (local index, read)
        self.stats["n_reads"] += len(reads)
        for i, (name, seq, qual) in enumerate(reads):
            sc = int(res["score"][i])
            rid = int(res["ref"][i])
            rl = int(lens[i])
            cov = int(res["cov"][i])
            eff = sc + (cov >> 5)
            thr, long_thr = _score_threshold(
                rl, self.min_score, self.filter_min_length)
            ok = rid >= 0 and (eff >= thr or (
                long_thr and eff >= long_thr
                and cov >= self.filter_min_length))
            if self.exact_fallback:
                ambiguous = (
                    # another genome scored within tie-order distance
                    (ok and sc - int(res["score_alt"][i]) <= self.amb_margin)
                    # hovering at the filter threshold
                    or (rid >= 0 and not ok and eff >= thr - self.amb_margin)
                    # seeds existed but the fast front-end found no anchors
                    or (rid < 0 and int(res["n_exist"][i]) >= AMB_MIN_EXIST)
                )
                if ambiguous:
                    replay.append((i, (name, seq, qual)))
            out.append(FastResult(
                name=name, ref_ID=rid if ok else -1,
                direction=int(res["direction"][i]) if ok else 0,
                score=sc, read_len=rl,
                pos=int(res["pos"][i]) if ok else -1))
        if replay:
            self.stats["n_fallback"] += len(replay)
        return out, replay

    def _replay(self, reads) -> list[FastResult]:
        """Exact adjudication of ambiguous reads via the native engine
        (bit-exact vs the reference binary, tests/test_native_engine.py).
        Serialized by _replay_lock: classify_batch runs replays on a
        worker thread while _classify_long may call from the main one."""
        with self._replay_lock:
            return self._replay_inner(reads)

    def _replay_inner(self, reads) -> list[FastResult]:
        if self._native is None:
            from .native import NativeClassifier

            self._native = NativeClassifier(
                self.oi, n_threads=self._fallback_threads)
        out = []
        for rr in self._native.classify_batch(reads):
            prim = next((h for h in rr.hits if h.primary == 1), None)
            if prim is None:
                out.append(FastResult(name=rr.name, ref_ID=-1, direction=0,
                                      score=0, read_len=len(rr.seq)))
            else:
                out.append(FastResult(
                    name=rr.name, ref_ID=prim.ref_ID,
                    direction=prim.direction, score=prim.sum_score,
                    read_len=len(rr.seq), pos=prim.t_st))
        return out

    # ------------------------------------------------------------- report --
    def tid_of(self, ref_ID: int) -> int:
        """tid from the 'tid|NNN|...' reference naming convention
        (cly_mt.c:777-786)."""
        if ref_ID < 0:
            return 0
        parts = self.oi.ref_names[ref_ID].split("|")
        return int(parts[1]) if len(parts) > 1 and parts[1].isdigit() else 0
