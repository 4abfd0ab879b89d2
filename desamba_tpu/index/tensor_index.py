"""Native tensor index: the logical DA_IDX contents laid out for TPU HBM.

Structure-of-arrays, int32 row arithmetic (shards stay < 2^31 rows — see
DESIGN.md), bit-plane BWT for VPU popcount occ:

  bwt_base  int32[n_blk, 8]    per-256bp-block cumulative counts (A,C,G,T,#
                               in lanes 0..4; lanes 5..7 zero padding)
  bwt_bits  uint32[n_blk, 5, 8] one-hot bit-planes of the 256 codes/block
                               (bit j of word w = code at row blk*256+w*32+j)
  bwt_pad   uint8[n_blk*256]   raw code stream incl. pad nibbles (occ_cur)
  hash13    int32[2^26+1]
  sa_uni / sa_off  int32[ceil(L/8)]
  ek0/ek1   uint32[size/4]     exist bitmaps as little-endian words
  uni_len, uni_reflist, refpos_*, ref_bin words, mapq tables

Serialized as one .npz + manifest (save/load); loadable straight into
jax device buffers (Engine.load -> device_put).
"""
from __future__ import annotations

import json
import os
from dataclasses import dataclass

import numpy as np

from ..constants import BP_PER_BLOCK, L_PRE_IDX
from ..oracle.mapq import mapq_tables


@dataclass
class TensorIndex:
    # FM
    bwt_base: np.ndarray
    bwt_bits: np.ndarray
    bwt_pad: np.ndarray
    rank: np.ndarray  # int64[6]
    hash13: np.ndarray  # int32[2^26+1]
    sa_uni: np.ndarray
    sa_off: np.ndarray
    dollar_pos: int
    L: int
    # unitigs / ref
    uni_len: np.ndarray
    uni_reflist: np.ndarray
    refpos_global: np.ndarray
    refpos_refid: np.ndarray
    ref_names: list
    ref_len: np.ndarray
    ref_offset: np.ndarray
    ref_bin: np.ndarray  # uint8 packed
    # exist filter
    ek_words0: np.ndarray  # uint32 big-endian-in-byte order preserved
    ek_words1: np.ndarray
    ek_mask_bits: int
    ek_len: int
    ek_single_base_max: int
    # scoring
    q_mem: np.ndarray
    q_lv: np.ndarray


def _bitplanes(codes_pad: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    n_blk = codes_pad.size // BP_PER_BLOCK
    c = codes_pad.reshape(n_blk, 8, 32)  # [blk, word, bit]
    bits = np.zeros((n_blk, 5, 8), dtype=np.uint32)
    shift = np.arange(32, dtype=np.uint32)
    for ch in range(5):
        eq = (c == ch).astype(np.uint32)
        bits[:, ch, :] = (eq << shift).sum(axis=2, dtype=np.uint32)
    base = np.zeros((n_blk, 8), dtype=np.int32)
    per = np.zeros((n_blk, 5), dtype=np.int64)
    for ch in range(5):
        per[:, ch] = (c == ch).sum(axis=(1, 2))
    base[1:, :5] = np.cumsum(per, axis=0)[:-1].astype(np.int32)
    return base, bits


def from_oracle_index(oi) -> TensorIndex:
    """Build from an OracleIndex (which holds loaded ref-format arrays).

    Note: the pad codes after row L are forced to 0 ('A') in the planes so
    occ stays exact; occ_cur still uses the raw pad stream."""
    codes = oi.codes.copy()
    codes_clean = codes.copy()
    codes_clean[oi.L :] = 0
    # base counts must count only valid rows: recompute from clean, then
    # subtract pad 'A's... simpler: compute from clean but mask >L at query
    # time; pads are 'A'=0 and occ queries never exceed L, but blocks after
    # L would accumulate pad zeros into later bases — there are no later
    # blocks with valid rows, so it is safe.
    base, bits = _bitplanes(codes_clean)
    f = oi
    ek0 = f.ek0
    ek1 = f.ek1
    return TensorIndex(
        bwt_base=base,
        bwt_bits=bits,
        bwt_pad=codes,
        rank=np.asarray(f.rank, dtype=np.int64),
        hash13=np.asarray(f.hash13, dtype=np.int64).astype(np.int32)
        if f.hash13.max(initial=0) < 2**31
        else np.asarray(f.hash13),
        sa_uni=np.asarray(f.sa_uni, dtype=np.int32),
        sa_off=np.asarray(f.sa_off, dtype=np.int32),
        dollar_pos=f.dollar_pos,
        L=f.L,
        uni_len=np.asarray(f.uni_len_ext, dtype=np.int32),
        uni_reflist=np.asarray(f.reflist_ext, dtype=np.int64),
        refpos_global=np.asarray(f.refpos_global, dtype=np.int64),
        refpos_refid=np.asarray(f.refpos_refid, dtype=np.int32),
        ref_names=list(f.ref_names),
        ref_len=np.asarray(f.ref_len, dtype=np.int64),
        ref_offset=np.asarray(f.ref_offset, dtype=np.int64),
        ref_bin=np.asarray(f.ref_bin, dtype=np.uint8),
        ek_words0=ek0.view(np.uint32) if ek0.size % 4 == 0 else ek0,
        ek_words1=ek1.view(np.uint32) if ek1.size % 4 == 0 else ek1,
        ek_mask_bits=f.ek.mask_bits,
        ek_len=f.ek.len_e_kmer,
        ek_single_base_max=f.ek.single_base_max,
        q_mem=np.asarray(f.q_mem, dtype=np.int32),
        q_lv=np.asarray(f.q_lv, dtype=np.int32),
    )


def save_tensor_format(built_or_oi, dirPath: str) -> None:
    from ..oracle.classify import OracleIndex
    from .format_ref import RefFormatIndex, save_ref_format

    if not isinstance(built_or_oi, OracleIndex):
        # BuiltIndex: round-trip through the ref format loader for uniformity
        import tempfile

        with tempfile.TemporaryDirectory() as td:
            save_ref_format(built_or_oi, td)
            oi = OracleIndex(RefFormatIndex(td))
    else:
        oi = built_or_oi
    ti = from_oracle_index(oi)
    os.makedirs(dirPath, exist_ok=True)
    arrays = {
        k: getattr(ti, k)
        for k in (
            "bwt_base bwt_bits bwt_pad rank hash13 sa_uni sa_off uni_len "
            "uni_reflist refpos_global refpos_refid ref_len ref_offset "
            "ref_bin ek_words0 ek_words1 q_mem q_lv"
        ).split()
    }
    np.savez_compressed(os.path.join(dirPath, "tensor_index.npz"), **arrays)
    manifest = dict(
        format_version=1,
        dollar_pos=ti.dollar_pos,
        L=ti.L,
        ref_names=ti.ref_names,
        ek_mask_bits=ti.ek_mask_bits,
        ek_len=ti.ek_len,
        ek_single_base_max=ti.ek_single_base_max,
    )
    with open(os.path.join(dirPath, "tensor_index.json"), "w") as fjs:
        json.dump(manifest, fjs)


def load_tensor_format(dirPath: str) -> TensorIndex:
    z = np.load(os.path.join(dirPath, "tensor_index.npz"))
    man = json.load(open(os.path.join(dirPath, "tensor_index.json")))
    return TensorIndex(
        **{k: z[k] for k in z.files},
        dollar_pos=man["dollar_pos"],
        L=man["L"],
        ref_names=man["ref_names"],
        ek_mask_bits=man["ek_mask_bits"],
        ek_len=man["ek_len"],
        ek_single_base_max=man["ek_single_base_max"],
    )
