"""The sparse approximate-match-block kernels.

TPU-native replacements for the reference's sdp_match scan
(cly.c:2330-2435) and the get_score_M2 rescoring driver (cly.c:2816-2844):
find the seeded 9-mer matches between a reference window and the read,
with maximal-exact-match extension lengths, entirely on device.

Two formulations:

1. Full block (matchblock_jnp / matchblock_pallas): a dense char-equality
   block E[t, q] = (target[t] == read[q]) per (window, read) pair; 9-mer
   seed hits are diagonal runs of length >= 9; extension lengths are
   diagonal run lengths via a doubling log-step scan. General — any
   (t, q) geometry — but O(T*Q) per pair.

2. Diagonal band (band_score_jnp): the production rescoring stage. In band coordinates (q, k) with k = t - q - k0, a
   DIAGONAL of the alignment matrix is a COLUMN, so MEM run lengths are
   consecutive-ones scans along q — one pass over [B, W, K] instead of
   doubling over [T, Q]. score[b] counts read positions that start a
   >= 9 bp exact match inside the band: exactly sum over band MEMs of
   (len - S_A_KMER_L + 1), the unit the reference's SDP accumulates
   (sms 'len' fields, cly.c:2330-2435, summed by the DP at
   cly.c:2480-2520) — so scores land on the reference sum_score scale.

The host (or later stages on device) applies the reference's q-window
filters and SDP in exact order when bit-exactness is needed; the fast
engine consumes band_score_* directly (engine/fast_engine.py stage 4).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..constants import S_A_KMER_L


def diag_run_lengths(eq):
    """Exact diagonal run lengths via prefix-scan per diagonal.

    run_right[t, q]: consecutive True count starting at (t, q) along +1,+1.
    run_left [t, q]: consecutive True count ending at (t-1, q-1) side,
    i.e. starting at (t, q) along -1,-1 EXCLUDING (t, q) itself.
    """
    T, Q = eq.shape
    e = eq.astype(jnp.int32)

    def body_rr(carry, row):
        # process anti-chronologically: carry = run_right of row t+1 shifted
        nxt = carry
        rr = row * (1 + jnp.concatenate([nxt[1:], jnp.zeros((1,), jnp.int32)]))
        return rr, rr

    _, rr = jax.lax.scan(body_rr, jnp.zeros((Q,), jnp.int32), e, reverse=True)

    def body_rl(carry, row):
        prv = carry
        rl = row * (1 + jnp.concatenate([jnp.zeros((1,), jnp.int32), prv[:-1]]))
        return rl, rl

    _, rl_inc = jax.lax.scan(body_rl, jnp.zeros((Q,), jnp.int32), e)
    # rl_inc includes (t,q); run_left excluding self = rl_inc shifted
    rl_excl = jnp.concatenate(
        [jnp.zeros((1, Q), jnp.int32), rl_inc[:-1]], axis=0
    )
    rl_excl = jnp.concatenate(
        [jnp.zeros((T, 1), jnp.int32), rl_excl[:, :-1]], axis=1
    )
    return rr, rl_excl


@partial(jax.jit, static_argnames=())
def matchblock_jnp(target, tmask, read, rmask):
    """target: int32[T] window codes, read: int32[Q] codes; masks bool.

    Returns (hit[T, Q] bool for 9-mer equality at (t, q), run_right,
    run_left) where run_* are diagonal MEM lengths as defined above."""
    eq = (target[:, None] == read[None, :]) & tmask[:, None] & rmask[None, :]
    rr, rl = diag_run_lengths(eq)
    hit = rr >= S_A_KMER_L
    return hit, rr, rl


# ----------------------------------------------------------- pallas ----
def matchblock_pallas(target, tmask, read, rmask, vmem_cap: int = 1 << 21,
                      interpret: bool = False):
    """Pallas TPU kernel: same contract as matchblock_jnp.

    One kernel instance owns the whole [T, Qp] block in VMEM; diagonal run
    lengths are computed with log-doubling over STATIC diagonal shifts
    (r_2k = r_k + (r_k == k) * r_k<<(k,k)), which lowers to pure VPU work.
    Falls back to the jnp path when the block exceeds the VMEM budget.
    interpret=True runs the kernel in the Pallas interpreter (CPU tests).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    T = int(target.shape[0])
    Q = int(read.shape[0])
    Qp = (Q + 127) // 128 * 128
    Tp = (T + 7) // 8 * 8
    if Tp * Qp > vmem_cap:
        return matchblock_jnp(target, tmask, read, rmask)

    tpad = jnp.pad(target.astype(jnp.int32), (0, Tp - T), constant_values=-1)
    tmp = jnp.pad(tmask, (0, Tp - T))
    readp = jnp.pad(read.astype(jnp.int32), (0, Qp - Q), constant_values=-2)
    rmp = jnp.pad(rmask, (0, Qp - Q))

    def _shift_diag(x, k, up_left: bool):
        # shift the block along the diagonal by k with zero fill (static
        # k). Implemented as circular rolls + an iota mask: Mosaic lowers
        # rolls natively, while pad/concat of lane-misaligned slices hits
        # "offset mismatch on non-concat dimension".
        from jax.experimental.pallas import tpu as pltpu

        rows = jax.lax.broadcasted_iota(jnp.int32, (Tp, Qp), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (Tp, Qp), 1)
        if up_left:  # result[t, q] = x[t-k, q-k], 0 where t<k or q<k
            y = pltpu.roll(pltpu.roll(x, k, 0), k, 1)
            return jnp.where((rows >= k) & (cols >= k), y, 0)
        # result[t, q] = x[t+k, q+k], 0 where t>=Tp-k or q>=Qp-k
        y = pltpu.roll(pltpu.roll(x, (-k) % Tp, 0), (-k) % Qp, 1)
        return jnp.where((rows < Tp - k) & (cols < Qp - k), y, 0)

    def kernel(t_ref, tm_ref, q_ref, qm_ref, hit_ref, rr_ref, rl_ref):
        t = t_ref[:]
        tm = tm_ref[:]
        q = q_ref[:]
        qm = qm_ref[:]
        eq = (t == q) & (tm != 0) & (qm != 0)
        e = eq.astype(jnp.int32)
        # run_right by doubling down-right
        rr = e
        k = 1
        while k < Tp:
            ext = _shift_diag(rr, k, up_left=False)
            rr = rr + jnp.where(rr == k, jnp.minimum(ext, k), 0)
            k <<= 1
        # inclusive run_left by doubling up-left
        rl = e
        k = 1
        while k < Tp:
            ext = _shift_diag(rl, k, up_left=True)
            rl = rl + jnp.where(rl == k, jnp.minimum(ext, k), 0)
            k <<= 1
        # exclusive run_left = inclusive at (t-1, q-1)
        rl_excl = _shift_diag(rl, 1, up_left=True)
        rr_ref[:] = rr
        rl_ref[:] = rl_excl
        hit_ref[:] = (rr >= S_A_KMER_L).astype(jnp.int32)

    out = pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Tp, Qp), jnp.int32),
            jax.ShapeDtypeStruct((Tp, Qp), jnp.int32),
            jax.ShapeDtypeStruct((Tp, Qp), jnp.int32),
        ],
        interpret=interpret,
    )(
        tpad[:, None],
        tmp[:, None].astype(jnp.int32),
        readp[None, :],
        rmp[None, :].astype(jnp.int32),
    )
    hit, rr, rl = out
    return hit[:T, :Q] != 0, rr[:T, :Q], rl[:T, :Q]


# ---------------------------------------------------------- banded ----
@partial(jax.jit, static_argnames=("K", "q_block"))
def band_score_jnp(read, rlen, win, K: int, q_block: int = 256):
    """Banded match-block score (the device get_score_M2 analog).

    read: int32[B, W] codes (0..3; pad rows are masked via rlen);
    rlen: int32[B]; win: int32[B, W + K - 1] reference codes where
    win[b, q + k] is the candidate diagonal-band position for read
    position q at band offset k (255 = outside the genome, never equal).

    Returns dict:
      score: int32[B]  — # read positions ending a >= 9 exact match in
             the band == sum over band MEMs of (len - 8); the reference
             sum_score scale (see module docstring)
      q_st/q_ed: int32[B] first/last read position covered (W / -1 when
             score == 0)

    A >= 9 run ending at q is just AND_{i=0..8} eq[q-i, k] — a 9-wide
    sliding AND along q, no run-length scan needed. Processed in
    q_block-column tiles with an 8-column lookback halo (runs crossing a
    tile boundary need only the previous 8 eq columns). The compares run
    in int8 (25% faster on the VPU than int32 at these shapes, measured
    on v5e); the out-of-genome sentinel 255 is remapped to -2 BEFORE the
    cast so it cannot collide with the -1 read halo (255 as int8 IS -1).
    """
    B, W = read.shape
    assert W % q_block == 0, (W, q_block)
    i32 = jnp.int32
    SAK = S_A_KMER_L  # 9
    H = SAK - 1       # lookback halo
    kk = jnp.arange(K, dtype=i32)[None, :]
    qq = jnp.arange(q_block, dtype=i32)[None, :]
    # leading halo of never-equal sentinels so tile 0 needs no clamping
    read_p = jnp.pad(read, ((0, 0), (H, 0)), constant_values=-1
                     ).astype(jnp.int8)
    win_p = jnp.pad(win, ((0, 0), (H, 0)), constant_values=-3)
    win_p = jnp.where(win_p >= 4, -2, win_p).astype(jnp.int8)
    gi = jnp.arange(q_block + H, dtype=i32)[:, None] + kk  # [Qb+H, K]

    def step(carry, q0):
        score, q_st, q_ed = carry
        # padded coords: tile covers read positions [q0-H, q0+q_block)
        rb = jax.lax.dynamic_slice(read_p, (0, q0), (B, q_block + H))
        wb = jax.lax.dynamic_slice(win_p, (0, q0), (B, q_block + H + K - 1))
        qv = (q0 - H + jnp.arange(q_block + H, dtype=i32)[None, :]
              ) < rlen[:, None]
        # eq[b, t, k] = read[b, q0-H+t] == win[b, q0-H+t+k], pos valid
        eq = (rb[:, :, None] == wb[:, gi]) & qv[:, :, None]
        # 9-wide sliding AND, one shifted slice per step. (A log-doubling
        # cascade — 4 ANDs instead of 8 — measured SLOWER on v5e: the
        # power-of-two lane-offset slices each cost a relayout that
        # outweighs the saved ANDs.)
        hit = eq[:, H:, :]
        for i in range(1, SAK):
            hit = hit & eq[:, H - i : H - i + q_block, :]
        hit_any = hit.any(axis=2)  # [B, Qb]
        score = score + hit_any.sum(axis=1, dtype=i32)
        qpos = q0 + qq
        q_st = jnp.minimum(q_st, jnp.where(hit_any, qpos, W).min(axis=1))
        q_ed = jnp.maximum(q_ed, jnp.where(hit_any, qpos, -1).max(axis=1))
        return (score, q_st, q_ed), None

    init = (
        jnp.zeros((B,), i32),
        jnp.full((B,), W, i32),
        jnp.full((B,), -1, i32),
    )
    q0s = jnp.arange(0, W, q_block, dtype=i32)
    (score, q_st, q_ed), _ = jax.lax.scan(step, init, q0s)
    return dict(score=score, q_st=q_st, q_ed=q_ed)
