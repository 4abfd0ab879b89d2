"""Exist-filter probe on device: rolling e-kmers + low-complexity filter +
two-hash bloom test, batched over [B, L] read-code matrices.

Replaces store_kmers + get_exist_kmer (cly.c:359-397, 951-967) with one
fused dispatch: window base counts via prefix sums, k-mers via lek shifted
adds (uint32 pair emulation), bitmap probes via word gathers. The bitmaps
live in HBM as uint32 words (MSB-first bit order within bytes preserved).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from . import u64emu as u64


class EkArrays:
    """Both bloom bitmaps in ONE device array (w1 words appended after
    w0's): the two per-kmer probes (hash64_1 into e_kmer0, hash64_2 into
    e_kmer1, idx.c:1014-1025) then run as a SINGLE gather — on TPU the
    probe gathers dominate stage 1, and one gather of 2N rows is
    measurably cheaper than two of N (same trick as the fused sp/ep occ
    in ops/fm.py). `n_words0` (static aux) is the w1 offset; equal-sized
    filters are implied by equal mask_bits, which the sharded engine
    already requires.

    fold_bits k > 0 ORs each bitmap down by 2^k — bit-exactly the bloom
    with mask_bits - k (the address split is pure low-bits of the hash),
    trading false-positive rate for table size. Measured on v5e: random
    gather rate drops ~1.7x once the table leaves the last ~32 MB cache
    tier, so the fast engine folds big filters to stay in the fast tier
    (FastClassifier auto rule; the ORACLE/native/hybrid paths always use
    the unfolded filter — bit parity there is the point). fold_bits='auto'
    folds while both bitmaps exceed 8M words (32 MB) AND the projected
    per-bitmap load stays under 35% (a fold doubles -log(1-load); at 35%
    each, joint bloom FP ~12% — beyond that seed-island noise starts
    displacing real top_seeds runs)."""

    def __init__(self, ti=None, device=None, _from=None, fold_bits=0):
        if _from is not None:
            (self.w01,), (self.n_words0, self.mask_bits, self.lek,
                          self.single_base_max) = _from
            return
        import numpy as np

        put = partial(jax.device_put, device=device)
        w0 = ti.ek_words0
        w1 = ti.ek_words1
        w0 = np.asarray(w0.view("uint32") if w0.dtype != "uint32" else w0)
        w1 = np.asarray(w1.view("uint32") if w1.dtype != "uint32" else w1)
        self.mask_bits = int(ti.ek_mask_bits)
        if fold_bits == "auto":
            # gate each fold on its PROJECTED load (ADVICE r4): folding at
            # load<=0.35 could land the bitmap at up to 58%; require the
            # post-fold load itself to stay under the 35% bound, on the
            # denser of the two bitmaps (different hashes => different
            # densities)
            fold_bits = 0
            load = max(_bitmap_load(w0), _bitmap_load(w1))
            while (w0.size >> fold_bits) > (8 << 20):
                next_load = 1 - (1 - load) ** 2
                if next_load > 0.35:
                    break
                fold_bits += 1
                load = next_load
        for _ in range(fold_bits):
            w0 = w0[: w0.size // 2] | w0[w0.size // 2 : 2 * (w0.size // 2)]
            w1 = w1[: w1.size // 2] | w1[w1.size // 2 : 2 * (w1.size // 2)]
            self.mask_bits -= 1
        self.fold_bits = fold_bits
        self.n_words0 = int(w0.size)
        self.w01 = put(jnp.asarray(np.concatenate([w0, w1])))
        self.lek = int(ti.ek_len)
        self.single_base_max = int(ti.ek_single_base_max)
        if (1 << self.mask_bits) > (1 << 35):
            raise NotImplementedError(
                "exist filters > 4 GiB need int64 word indexing; shard the "
                "index instead (DESIGN.md)"
            )

    # views for callers that address one bitmap (tests, oracle parity)
    @property
    def w0(self):
        return self.w01[: self.n_words0]

    @property
    def w1(self):
        return self.w01[self.n_words0 :]


def _bitmap_load(w) -> float:
    """Sampled fraction of set bits (the fold rule needs ~1% accuracy)."""
    import numpy as np

    s = np.asarray(w[:: max(1, w.size // (1 << 20))])
    if hasattr(np, "bitwise_count"):
        bits = int(np.bitwise_count(s).sum())
    else:
        bits = int(np.unpackbits(s.view(np.uint8)).sum())
    return bits / (s.size * 32)


import jax.tree_util as _jtu  # noqa: E402

_jtu.register_pytree_node(
    EkArrays,
    lambda ek: ((ek.w01,),
                (ek.n_words0, ek.mask_bits, ek.lek, ek.single_base_max)),
    lambda aux, leaves: EkArrays(_from=(leaves, aux)),
)


def _addr(h):
    """Hash -> (word index, bit shift within word): byte h>>3, bit 7-(h&7)
    (idx.c:1019), little-endian u32 words of 4 bytes."""
    hi, lo = h
    # mask_bits <= 37 -> byte index <= 2^34; word index needs up to 35 bits
    # but practical filters here are <= 4 GiB (word index < 2^30) -> int32
    word_idx = ((lo >> jnp.uint32(5)) | (hi << jnp.uint32(27))).astype(jnp.int32)
    byte_in_word = (lo >> jnp.uint32(3)) & jnp.uint32(3)
    bit = jnp.uint32(7) - (lo & jnp.uint32(7))
    return word_idx, byte_in_word * jnp.uint32(8) + bit


def _probe(words, h):
    """Bit test at hash h (single-bitmap variant; kept for parity tests)."""
    word_idx, shift = _addr(h)
    return ((words[word_idx] >> shift) & jnp.uint32(1)).astype(jnp.bool_)


def _probe_both(w01, n_words0: int, h1, h2):
    """Both bloom tests with ONE gather into the concatenated bitmaps."""
    wi1, sh1 = _addr(h1)
    wi2, sh2 = _addr(h2)
    w = w01[jnp.concatenate([wi1, wi2 + n_words0], axis=0)]
    B = wi1.shape[0]
    r1 = ((w[:B] >> sh1) & jnp.uint32(1)).astype(jnp.bool_)
    r2 = ((w[B:] >> sh2) & jnp.uint32(1)).astype(jnp.bool_)
    return r1, r2


def _grid(n_kmer: int, stride: int) -> int:
    """Stride-grid size: positions p(g) = (stride-1) + stride*g, the exact
    probe schedule of search_exist_kmer_M2 (i = STEP_EK-1; i += STEP_EK,
    cly.c:979)."""
    return (n_kmer - stride) // stride + 1


@partial(jax.jit,
         static_argnames=("lek", "single_base_max", "mask_bits", "stride",
                          "n_words0"))
def _probe_reads(w01, codes, lengths, lek: int, single_base_max: int,
                 mask_bits: int, stride: int = 1, n_words0: int = 0):
    """stride>1 probes only the reference's STEP_EK grid (cly.c:969,979):
    the bitmap gathers dominate this stage on TPU, so probing every 3rd
    k-mer — exactly what the C does — cuts the cost 3x. Outputs are on the
    stride grid: column g is read offset (stride-1) + stride*g."""
    B, L = codes.shape
    n_kmer = L - lek + 1
    n_g = _grid(n_kmer, stride)
    c = codes.astype(jnp.int32)

    def sub(x, j0):  # columns j0 + stride*[0, n_g) of a [B, >=...] array
        return x[:, j0 : j0 + stride * (n_g - 1) + 1 : stride]

    p0 = stride - 1  # first probed offset
    # window base counts via prefix sums  [B, L+1]
    valid = (jnp.arange(L)[None, :] < lengths[:, None]).astype(jnp.int32)
    fail = jnp.zeros((B, n_g), jnp.bool_)
    for base in range(4):
        is_b = ((c == base) & (valid == 1)).astype(jnp.int32)
        ps = jnp.concatenate(
            [jnp.zeros((B, 1), jnp.int32), jnp.cumsum(is_b, axis=1)], axis=1)
        wc = sub(ps, p0 + lek) - sub(ps, p0)  # count in [p, p+lek)
        fail = fail | (wc >= single_base_max)
    # rolling kmers as uint32 pair (lek <= 20 -> 40 bits)
    hi = jnp.zeros((B, n_g), jnp.uint32)
    lo = jnp.zeros((B, n_g), jnp.uint32)
    for j in range(lek):
        cc = sub(c, p0 + j).astype(jnp.uint32)
        hi = (hi << jnp.uint32(2)) | (lo >> jnp.uint32(30))
        lo = (lo << jnp.uint32(2)) | cc
    kzero = (hi == 0) & (lo == 0)
    kmer = (hi, lo)
    keep = ~fail & ~kzero
    h1 = u64.and_mask_bits(u64.hash64_1(kmer), mask_bits)
    h2 = u64.and_mask_bits(u64.hash64_2(kmer), mask_bits)
    r1, r2 = _probe_both(w01, n_words0, h1, h2)
    pos = p0 + stride * jnp.arange(n_g, dtype=jnp.int32)
    in_read = pos[None, :] + lek <= lengths[:, None]
    return (keep & r1 & r2 & in_read).astype(jnp.uint8)


@partial(jax.jit, static_argnames=("lek", "stride"))
def kmer_lo26(codes, lek: int, stride: int = 1):
    """Low 26 bits (last 13 bases) of the e-kmer ending at each offset —
    the hash13 prefix value pre_v (PRE_IDX_MASK, idx.h:59) per position.

    codes: uint8[B, L]; returns int32[B, n_grid] on the same stride grid
    as _probe_reads (column g = read offset (stride-1) + stride*g)."""
    B, L = codes.shape
    n_kmer = L - lek + 1
    n_g = _grid(n_kmer, stride)
    p0 = stride - 1
    c = codes.astype(jnp.uint32)
    lo = jnp.zeros((B, n_g), jnp.uint32)
    for j in range(lek - 13, lek):
        j0 = p0 + j
        lo = (lo << jnp.uint32(2)) | c[:, j0 : j0 + stride * (n_g - 1) + 1 : stride]
    return (lo & jnp.uint32(0x3FFFFFF)).astype(jnp.int32)


def probe_reads(ek: EkArrays, codes, lengths):
    """codes: uint8[B, L] (CLY_BIT codes, padded), lengths: int32[B].

    Returns uint8[B, L-lek+1]: 1 where the e-kmer at that offset passes the
    complexity filter and both bloom probes (exact get_exist_kmer result)."""
    return _probe_reads(
        ek.w01, jnp.asarray(codes), jnp.asarray(lengths, jnp.int32),
        ek.lek, ek.single_base_max, ek.mask_bits, n_words0=ek.n_words0,
    )
