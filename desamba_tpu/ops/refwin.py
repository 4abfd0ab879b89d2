"""Device-side 2-bit reference window gathers.

The TPU analog of get_ref (cly.c:434-461): the M2 rescorer streams <=600 bp
reference windows per chain (sdp_right/left, cly.c:2573,2717); on device the
whole 2-bit packed reference lives in HBM (it IS the index's ref_bin,
idx.c:594-603) and each candidate gathers its diagonal-band window with one
vectorized byte gather + shift.

Packing contract (matches the reference and oracle.get_ref): 4 codes per
byte, MSB-first — code(i) = (ref_bin[i>>2] >> (6 - 2*(i&3))) & 3.
Out-of-range / out-of-genome positions return 255 (unmatchable), modeling
the reference's behavior of never scoring past the genome under the chain's
ref_ID (window clamps in sdp_right_M2, cly.c:2560-2573).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


class RefArrays:
    """Device-resident packed reference + per-genome extents (a jax pytree).

    Holds the 2-bit reference both as bytes (exact per-position gathers)
    and as little-endian uint32 words of 16 codes (the production band
    gather: 16x fewer random gathers, unpack on the VPU)."""

    def __init__(self, ti=None, device=None, _from=None):
        if _from is not None:
            (self.ref_bytes, self.ref_words, self.ref_words_lsb,
             self.ref_offset, self.ref_len), () = _from
            return
        put = partial(jax.device_put, device=device)
        if np.asarray(ti.ref_offset).max(initial=0) + np.asarray(
                ti.ref_len).max(initial=0) >= 2**31:
            raise NotImplementedError(
                "reference > 2^31 bp per shard; shard the index "
                "(parallel/shard_index.py)")
        rb = np.asarray(ti.ref_bin, dtype=np.uint8)
        self.ref_bytes = put(jnp.asarray(rb))
        pad = (-len(rb)) % 4
        rw = np.pad(rb, (0, pad)).view("<u4")
        self.ref_words = put(jnp.asarray(rw))
        # LSB-first repack for the SWAR banded scorer (band_score_packed):
        # code t of word w at bits 2t — the same order as the read wire
        # format — so read/window words compare with one XOR. Per-byte
        # 2-bit-pair reversal LUT, then the same <u4 view.
        b = np.arange(256, dtype=np.uint8)
        rev = (((b >> 6) & 3) | (((b >> 4) & 3) << 2)
               | (((b >> 2) & 3) << 4) | ((b & 3) << 6)).astype(np.uint8)
        self.ref_words_lsb = put(jnp.asarray(
            np.pad(rev[rb], (0, pad)).view("<u4")))
        self.ref_offset = put(jnp.asarray(ti.ref_offset, dtype=jnp.int32))
        self.ref_len = put(jnp.asarray(ti.ref_len, dtype=jnp.int32))


jax.tree_util.register_pytree_node(
    RefArrays,
    lambda ra: ((ra.ref_bytes, ra.ref_words, ra.ref_words_lsb,
                 ra.ref_offset, ra.ref_len), ()),
    lambda aux, leaves: RefArrays(_from=(leaves, aux)),
)


@partial(jax.jit, static_argnames=("n",))
def gather_windows(ra: RefArrays, ref_id, g0, n: int):
    """Gather n reference codes starting at global offset g0 per lane.

    ref_id: int32[B] genome the window must stay inside (positions outside
    [ref_offset[r], ref_offset[r]+ref_len[r]) return 255); g0: int32[B]
    global start. Returns int32[B, n]."""
    ref_id = jnp.asarray(ref_id, jnp.int32)
    g0 = jnp.asarray(g0, jnp.int32)
    total = ra.ref_bytes.shape[0] * 4
    pos = g0[:, None] + jnp.arange(n, dtype=jnp.int32)[None, :]
    rc = jnp.clip(ref_id, 0, ra.ref_offset.shape[0] - 1)
    lo = ra.ref_offset[rc][:, None]
    hi = lo + ra.ref_len[rc][:, None]
    ok = (pos >= lo) & (pos < hi) & (pos >= 0) & (pos < total) & (
        ref_id >= 0)[:, None]
    p = jnp.clip(pos, 0, total - 1)
    byte = ra.ref_bytes[p >> 2].astype(jnp.int32)
    code = (byte >> (6 - 2 * (p & 3))) & 3
    return jnp.where(ok, code, 255)


@partial(jax.jit, static_argnames=("n",))
def gather_band_windows(ra: RefArrays, ref_id, g0a, n: int):
    """Production window gather for the banded rescorer: g0a MUST be
    16-aligned (caller aligns the band start down and widens the band by
    16). Gathers uint32 words of 16 codes each — 16x fewer random HBM
    gathers than per-position bytes — then unpacks on the VPU.

    Word layout: little-endian u32 over MSB-first 2-bit bytes, so code
    t in [0,16) of word w sits at shift 8*(t>>2) + 6 - 2*(t&3).
    Same out-of-genome masking contract as gather_windows (255)."""
    assert n % 16 == 0, n
    ref_id = jnp.asarray(ref_id, jnp.int32)
    g0a = jnp.asarray(g0a, jnp.int32)
    nw = n // 16
    total_w = ra.ref_words.shape[0]
    widx = (g0a >> 4)[:, None] + jnp.arange(nw, dtype=jnp.int32)[None, :]
    words = ra.ref_words[jnp.clip(widx, 0, total_w - 1)]  # [B, nw] u32
    t = jnp.arange(16, dtype=jnp.uint32)
    shift = 8 * (t >> 2) + 6 - 2 * (t & 3)
    codes = (words[:, :, None] >> shift[None, None, :]) & jnp.uint32(3)
    B = ref_id.shape[0]
    code = codes.astype(jnp.int32).reshape(B, n)
    total = ra.ref_bytes.shape[0] * 4
    pos = g0a[:, None] + jnp.arange(n, dtype=jnp.int32)[None, :]
    rc = jnp.clip(ref_id, 0, ra.ref_offset.shape[0] - 1)
    lo = ra.ref_offset[rc][:, None]
    hi = lo + ra.ref_len[rc][:, None]
    ok = (pos >= lo) & (pos < hi) & (pos >= 0) & (pos < total) & (
        ref_id >= 0)[:, None]
    return jnp.where(ok, code, 255)
