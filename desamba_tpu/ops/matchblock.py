"""The sparse approximate-match-block kernel.

This is the TPU-native replacement for the reference's sdp_match scan
(cly.c:2330-2435): for each (chain, reference-window) pair, find the
seeded 9-mer matches between the target window and the read, with the
left/right maximal-exact-match extension lengths, entirely on device.

Formulation: a dense char-equality block E[t, q] = (target[t] == read[q])
per (window, read) pair; 9-mer seed hits are diagonal runs of length >= 9
starting at probed positions (every 4th window offset); extension lengths
are diagonal run lengths, computed with a doubling log-step scan. One
fused kernel turns the reference's per-probe hash chases into regular
VPU work over [T, Q] blocks.

Two implementations:
  * matchblock_jnp  — jax.numpy (portable, used for verification)
  * matchblock_pallas — Pallas TPU kernel tiling Q into lanes

Both return, per probe offset i (i % 4 == 0, i >= 4) and read position q:
  hit[i//4, q]   — 9-mer at window offset i equals read 9-mer at q
  run_left / run_right — maximal equal-run lengths around each (t, q)
The host (or later stages on device) applies the reference's q-window
filters and SDP in exact order.
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
def matchblock_pallas(target, tmask, read, rmask, vmem_cap: int = 1 << 21):
    """Pallas TPU kernel: same contract as matchblock_jnp.

    One kernel instance owns the whole [T, Qp] block in VMEM; diagonal run
    lengths are computed with log-doubling over STATIC diagonal shifts
    (r_2k = r_k + (r_k == k) * r_k<<(k,k)), which lowers to pure VPU work.
    Falls back to the jnp path when the block exceeds the VMEM budget.
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
        # shift the block along the diagonal by k with zero fill (static k)
        if up_left:
            core = x[: Tp - k, : Qp - k]
            return jnp.pad(core, ((k, 0), (k, 0)))
        core = x[k:, k:]
        return jnp.pad(core, ((0, k), (0, k)))

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
    )(
        tpad[:, None],
        tmp[:, None].astype(jnp.int32),
        readp[None, :],
        rmp[None, :].astype(jnp.int32),
    )
    hit, rr, rl = out
    return hit[:T, :Q] != 0, rr[:T, :Q], rl[:T, :Q]
