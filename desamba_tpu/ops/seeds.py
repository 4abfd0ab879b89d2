"""Device-side seed selection from exist-filter probe maps.

The TPU reformulation of get_seed_vector_M2 (cly.c:1157-1229): instead of
the serial island walk with stride-3 probing, compute the run length of
consecutive existing k-mers ending at every offset (one masked prefix-scan)
and pick the longest run per SEED_RANGE window (one segment max) — each
read yields a fixed [n_win] grid of (kmer_index, island_len) seeds, padded
with zeros, ready for lockstep FM search.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..constants import SEED_RANGE


@jax.jit
def run_lengths(exists):
    """int32[B, nk] run of consecutive 1s ending at each position."""
    ex = jnp.asarray(exists).astype(jnp.int32)
    B, nk = ex.shape
    idx = jnp.arange(nk, dtype=jnp.int32)[None, :]
    # last position with a zero at-or-before i (running max of masked iota)
    last0 = jax.lax.associative_scan(
        jnp.maximum, jnp.where(ex == 0, idx, -1), axis=1)
    return jnp.where(ex == 1, idx - last0, 0)


@partial(jax.jit, static_argnames=("window",))
def top_seeds(exists, window: int = SEED_RANGE):
    """Longest island per window.

    exists: uint8[B, nk]. Returns (kidx int32[B, n_win], runlen int32[B,
    n_win]): the k-mer index of the longest run *end* in each window and
    its length (0 where the window has no existing k-mer)."""
    ex = jnp.asarray(exists).astype(jnp.int32)
    B, nk = ex.shape
    r = run_lengths(exists)
    n_win = -(-nk // window)
    pad = n_win * window - nk
    rp = jnp.pad(r, ((0, 0), (0, pad)))
    # encode (run_len, prefer-earlier-position) for a single segment max
    pos_in_w = jnp.arange(n_win * window, dtype=jnp.int32) % window
    enc = rp * window * 2 + (window - 1 - pos_in_w)[None, :]
    enc = jnp.where(rp > 0, enc, -1)
    seg = enc.reshape(B, n_win, window)
    best = seg.max(axis=2)
    has = best >= 0
    runlen = jnp.where(has, best // (window * 2), 0)
    off_in_w = jnp.where(has, (window - 1) - (best % (window * 2)), 0)
    base = (jnp.arange(n_win, dtype=jnp.int32) * window)[None, :]
    kidx = jnp.where(has, base + off_in_w, 0)
    return kidx, runlen
