"""Index builder: reference FASTA -> deSAMBA-compatible FM/unitig index.

Rebuilds, fully vectorized in NumPy, the logical pipeline of the reference
(`deSAMBA kmersort` + `deSAMBA index`, idx_sort.c / idx.c / bwt.c) without
Jellyfish and without the reference's serial LF-walk:

  1. distinct forward 31-mers of every ACGT run           (idx_sort.c:101-204)
  2. de Bruijn in/out edge masks from observed adjacency  (idx.c:125-306)
  3. unitig start/end labeling                            (idx.c:392-512)
  4. unitig chains via pointer doubling (replaces the sequential walk of
     idx.c:723-854); unitig IDs = sorted order of start k-mers
  5. BWT row ordering by one lexsort over
     (62-bit padded suffix key, suffix length, generation order) —
     provably the order produced by the streaming merge of sorted k-mers
     with sentinel-truncated "special" k-mers (idx.c:345-389, 856-880,
     884-963; see spkmer_cmp_l + the inverted ksort_stable convention at
     lib/utils.c:417 which makes the sort ascending/specials-first)
  6. sampled SA computed directly from row identities — the reference
     reconstructs it with a serial backward LF walk (idx.c:1163-1237);
     we know each row's (unitig, offset) already, so no walk is needed
  7. 13-mer prefix interval table                         (idx.c:333-342,944-961)
  8. ref<->unitig occurrence list + CSR + 2-bit reference (idx.c:554-706)
  9. exist-filter bitmaps                                 (idx.c:966-1026)
"""
from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from ..constants import (
    B_KMER,
    CODE_DOLLAR,
    CODE_HASH,
    EK_SIZE_LADDER,
    L_PRE_IDX,
    MIN_UNI_L,
    NUM_BP_OCCUPY_ONE_SA,
    SINGLE_BASE_MAX_RATIO,
)
from ..io.fastx import read_fastx
from ..utils import codec
from ..utils.hashes import hash64_1, hash64_2

_U64 = np.uint64
_KMER_TOP_SHIFT = _U64(2 * (B_KMER - 1))  # 60
_KMER_MASK = _U64((1 << (2 * B_KMER)) - 1)
_KMER_LOW_MASK = _U64((1 << (2 * (B_KMER - 1))) - 1)  # low 60 bits


@dataclass
class EkParams:
    size: int
    mask_bits: int
    len_e_kmer: int

    @property
    def hash_mask(self) -> int:
        return (1 << self.mask_bits) - 1

    @property
    def single_base_max(self) -> int:
        return int(SINGLE_BASE_MAX_RATIO * self.len_e_kmer)


def ek_params_for(n_kmer: int) -> EkParams:
    """Auto-scaled exist-filter geometry (idx.c:986-998, 966-982)."""
    for threshold, size, bits, lek in EK_SIZE_LADDER:
        if n_kmer < threshold:
            return EkParams(size, bits, lek)
    return EkParams(*EK_SIZE_LADDER[-1][1:])


@dataclass
class BuiltIndex:
    """Logical index contents (the DA_IDX contract, idx.h:83-110)."""

    n_kmer: int
    # --- FM index ---
    bwt_codes: np.ndarray  # uint8[L] codes 0..5, row order
    rank: np.ndarray  # int64[6]
    hash13: np.ndarray  # int64[2^26+1] interval starts
    sa_uni: np.ndarray  # uint32[ceil(L/8)]
    sa_off: np.ndarray  # uint32[ceil(L/8)]
    dollar_pos: int
    # --- unitigs ---
    uni_len: np.ndarray  # int64[N] unitig lengths (bp)
    uni_reflist: np.ndarray  # int64[N+1] CSR into ref_pos (quirky ref layout kept)
    # --- ref mapping ---
    refpos_global: np.ndarray  # int64[n_occ] global offsets
    refpos_refid: np.ndarray  # int32[n_occ]
    refpos_dir: np.ndarray  # uint8[n_occ] (1 = FORWARD)
    ref_names: list
    ref_len: np.ndarray  # int64[n_ref]
    ref_offset: np.ndarray  # int64[n_ref]
    ref_bin: np.ndarray  # uint8 packed 2-bit, total genome
    ref_total: int
    # --- exist filter ---
    ek: EkParams
    ek0: np.ndarray  # uint8[ek.size]
    ek1: np.ndarray  # uint8[ek.size]

    @property
    def n_unitig(self) -> int:
        return len(self.uni_len)

    @property
    def bwt_len(self) -> int:
        return len(self.bwt_codes)


def _locate(sorted_kmers: np.ndarray, keys: np.ndarray) -> np.ndarray:
    loc = np.searchsorted(sorted_kmers, keys)
    if loc.size and (
        loc.max(initial=0) >= sorted_kmers.size
        or not np.array_equal(sorted_kmers[loc], keys)
    ):
        raise ValueError("k-mer not found in sorted set (corrupt build state)")
    return loc


_POPCNT4 = np.array([0, 1, 1, 2, 1, 2, 2, 3, 1, 2, 2, 3, 2, 3, 3, 4], dtype=np.uint8)


def build_index(ref_path_or_records, progress=None) -> BuiltIndex:
    """Build the full index from a FASTA path (or iterable of SeqRecord)."""
    log = progress or (lambda *_: None)
    if isinstance(ref_path_or_records, (str, bytes)) or hasattr(
        ref_path_or_records, "__fspath__"
    ):
        records = list(read_fastx(ref_path_or_records))
    else:
        records = list(ref_path_or_records)

    # ---- pass 0: encode sequences, find runs --------------------------
    seq_codes = [codec.seq_to_codes(r.seq, codec.BIT) for r in records]
    runs_per_seq = [codec.acgt_runs(c) for c in seq_codes]

    # ---- step 1: distinct sorted 31-mers ------------------------------
    log("kmers")
    kmer_chunks = []
    for codes, runs in zip(seq_codes, runs_per_seq):
        for s, e in runs:
            if e - s >= B_KMER:
                kmer_chunks.append(codec.rolling_kmers(codes[s:e], B_KMER))
    if not kmer_chunks:
        raise ValueError("no ACGT run of length >= 31 in the reference")
    kv = np.unique(np.concatenate(kmer_chunks))
    n_kmer = int(kv.size)
    del kmer_chunks

    # ---- step 2: edges + heads/tails ----------------------------------
    log("edges")
    in_e = np.zeros(n_kmer, dtype=np.uint8)
    out_e = np.zeros(n_kmer, dtype=np.uint8)
    heads_list, tails_list = [], []
    run_kmer_locs = []  # per (seq, run): locs of each kmer position (reused in step 8)
    for codes, runs in zip(seq_codes, runs_per_seq):
        for s, e in runs:
            if e - s < B_KMER:
                run_kmer_locs.append(None)
                continue
            ks = codec.rolling_kmers(codes[s:e], B_KMER)
            locs = np.searchsorted(kv, ks)
            run_kmer_locs.append(locs)
            heads_list.append(locs[0])
            tails_list.append(locs[-1])
            if ks.size > 1:
                nxt = codes[s + B_KMER : e].astype(np.uint8)  # base after kmer i
                prv = codes[s : e - B_KMER].astype(np.uint8)  # base before kmer i+1
                np.bitwise_or.at(out_e, locs[:-1], np.uint8(1) << nxt)
                np.bitwise_or.at(in_e, locs[1:], np.uint8(1) << prv)
    heads = np.array(heads_list, dtype=np.int64)
    tails = np.array(tails_list, dtype=np.int64)

    # ---- step 3: start/end labels (idx.c:392-512) ---------------------
    log("labels")
    is_start = np.zeros(n_kmer, dtype=bool)
    is_end = np.zeros(n_kmer, dtype=bool)
    in_cnt = _POPCNT4[in_e]
    out_cnt = _POPCNT4[out_e]

    def _mark_pred_ends(src_mask: np.ndarray) -> None:
        # for kmers in src_mask, every in-edge's predecessor becomes an end
        for j in range(4):
            sel = src_mask & ((in_e >> j) & 1).astype(bool)
            if sel.any():
                keys = (kv[sel] >> _U64(2)) | (_U64(j) << _KMER_TOP_SHIFT)
                is_end[_locate(kv, keys)] = True

    def _mark_succ_starts(src_mask: np.ndarray) -> None:
        for j in range(4):
            sel = src_mask & ((out_e >> j) & 1).astype(bool)
            if sel.any():
                keys = ((kv[sel] & _KMER_LOW_MASK) << _U64(2)) | _U64(j)
                is_start[_locate(kv, keys)] = True

    m = in_cnt != 1
    is_start[m] = True
    _mark_pred_ends(m)
    m = out_cnt != 1
    is_end[m] = True
    _mark_succ_starts(m)
    # heads/tails (idx.c:440-489)
    hmask = np.zeros(n_kmer, dtype=bool)
    hmask[heads] = True
    is_start[hmask] = True
    _mark_pred_ends(hmask)
    tmask = np.zeros(n_kmer, dtype=bool)
    tmask[tails] = True
    is_end[tmask] = True
    _mark_succ_starts(tmask)

    # ---- step 4: unitig chains (pointer doubling) ---------------------
    log("unitigs")
    # unique predecessor for non-start kmers (in-degree is exactly 1 there)
    prev = np.arange(n_kmer, dtype=np.int64)
    nonstart = ~is_start
    if nonstart.any():
        in_base = np.zeros(n_kmer, dtype=np.uint8)
        for j in range(4):
            in_base[(in_e == (1 << j))] = j
        keys = (kv[nonstart] >> _U64(2)) | (
            in_base[nonstart].astype(_U64) << _KMER_TOP_SHIFT
        )
        prev[nonstart] = _locate(kv, keys)
    depth = nonstart.astype(np.int64)
    p = prev
    while True:
        depth = depth + depth[p]
        p2 = p[p]
        if np.array_equal(p2, p):
            break
        p = p2
    root = p
    if not is_start[root].all():
        raise AssertionError("unitig chain without a start (orphan cycle)")
    # unitig IDs in sorted-start-kmer order (= index order, kv is sorted)
    n_uni = int(is_start.sum())
    uid_of_start = np.cumsum(is_start) - 1
    uid = uid_of_start[root].astype(np.int64)
    pos = depth  # position of kmer within its unitig chain (0-based)
    chain_size = np.bincount(uid, minlength=n_uni)
    uni_len = chain_size + (B_KMER - 1)
    end_locs = np.nonzero(is_end)[0]
    if end_locs.size != n_uni:
        raise AssertionError("end-kmer count != unitig count")
    end_kmer_of = np.empty(n_uni, dtype=_U64)
    end_kmer_of[uid[end_locs]] = kv[end_locs]

    # BWT char per ordinary kmer: sentinel for starts, else first base of the
    # predecessor kmer (idx.c:733-753)
    bwt_char_kmer = np.empty(n_kmer, dtype=np.uint8)
    bwt_char_kmer[is_start] = CODE_HASH
    bwt_char_kmer[is_start & (uid == 0)] = CODE_DOLLAR  # unitig 0 start
    bwt_char_kmer[nonstart] = (kv[prev[nonstart]] >> _KMER_TOP_SHIFT).astype(np.uint8)

    # ---- step 5: BWT row ordering -------------------------------------
    log("bwt")
    # specials: for each unitig's end kmer E, suffixes of length sp in 30..1
    sp = np.arange(B_KMER - 1, 0, -1, dtype=np.int64)  # 30..1 (gen order)
    sp_len = np.tile(sp, n_uni)
    sp_u = np.repeat(np.arange(n_uni, dtype=np.int64), B_KMER - 1)
    ek_rep = np.repeat(end_kmer_of, B_KMER - 1)
    sp_mask = (_U64(1) << (sp_len.astype(_U64) * _U64(2))) - _U64(1)
    sp_val = ek_rep & sp_mask
    sp_char = ((ek_rep >> (sp_len.astype(_U64) * _U64(2))) & _U64(3)).astype(np.uint8)
    sp_key = sp_val << ((_U64(B_KMER) - sp_len.astype(_U64)) * _U64(2))

    all_key = np.concatenate([kv, sp_key])
    all_len = np.concatenate(
        [np.full(n_kmer, B_KMER, dtype=np.int64), sp_len]
    )
    order = np.lexsort((np.arange(all_key.size), all_len, all_key))
    # merged rows (after the n_uni sentinel rows)
    merged_char = np.concatenate([bwt_char_kmer, sp_char])[order]
    sent_char = (end_kmer_of & _U64(3)).astype(np.uint8)  # idx.c:525,921-925
    bwt_codes = np.concatenate([sent_char, merged_char])
    L = bwt_codes.size

    # row suffix identity (unitig, position) for the SA
    merged_u = np.concatenate([uid, sp_u])[order]
    merged_p = np.concatenate([pos, uni_len[sp_u] - sp_len])[order]
    row_u = np.concatenate([np.arange(n_uni, dtype=np.int64), merged_u])
    row_p = np.concatenate([uni_len, merged_p])

    # rank (bwt.c:110-138): counts of chars over the BWT string
    cnt = np.bincount(bwt_codes, minlength=6).astype(np.int64)
    rank = np.zeros(6, dtype=np.int64)
    rank[0] = cnt[4] + cnt[5]
    rank[1] = rank[0] + cnt[0]
    rank[2] = rank[1] + cnt[1]
    rank[3] = rank[2] + cnt[2]
    rank[4] = 0
    rank[5] = rank[0] - 1
    dollar_pos = n_uni - 1  # sentinel row of the last unitig (idx.c:1128,1181)

    # ---- step 6: sampled SA (no LF walk) ------------------------------
    log("sa")
    s_rows = np.arange(0, L, NUM_BP_OCCUPY_ONE_SA, dtype=np.int64)
    su = row_u[s_rows].copy()
    spos = row_p[s_rows].copy()
    zero = spos == 0
    su[zero] = (su[zero] - 1) % n_uni
    spos[zero] = uni_len[su[zero]] + 1  # becomes len after the -1 below
    spos = spos - 1
    sa_uni = su.astype(np.uint32)
    sa_off = spos.astype(np.uint32)

    # ---- step 7: 13-mer prefix intervals ------------------------------
    log("hash13")
    all_key_sorted = all_key[order]
    all_len_sorted = all_len[order]
    haspre = all_len_sorted >= L_PRE_IDX
    pref = (all_key_sorted[haspre] >> _U64(2 * (B_KMER - L_PRE_IDX))).astype(np.int64)
    rows = np.nonzero(haspre)[0] + n_uni  # +n_uni sentinel rows at front
    upref, first_i, counts = np.unique(pref, return_index=True, return_counts=True)
    istart = rows[first_i]
    iend = rows[first_i + counts - 1] + 1
    hsize = (1 << (2 * L_PRE_IDX)) + 1
    # hash13[h] = start of h's interval if present else end of the previous
    # present interval; hash13[h+1]-like lookups then yield empty ranges for
    # absent prefixes (idx.c:944-961)
    hash13 = np.empty(hsize, dtype=np.int64)
    j = np.searchsorted(upref, np.arange(hsize, dtype=np.int64), side="right")
    prev_end = np.concatenate([[0], iend])[j]
    hash13[:] = prev_end
    hash13[upref] = istart

    # ---- step 8: ref<->unitig occurrences + 2-bit reference -----------
    log("refmap")
    ref_names = [r.name for r in records]
    ref_len_arr = np.array([len(r.seq) for r in records], dtype=np.int64)
    ref_offset = np.concatenate([[0], np.cumsum(ref_len_arr)[:-1]]).astype(np.int64)
    total = int(ref_len_arr.sum())
    all_bin = np.concatenate(
        [codec.seq_to_codes(r.seq, codec.BIN_BIT) for r in records]
    ) if records else np.empty(0, dtype=np.uint8)
    ref_bin = codec.pack_2bit(all_bin)
    del all_bin

    occ_u, occ_ref, occ_off = [], [], []
    ri = 0
    for rid, (codes, runs) in enumerate(zip(seq_codes, runs_per_seq)):
        for s, e in runs:
            locs = run_kmer_locs[ri]
            ri += 1
            if locs is None:
                continue
            # unitig starts tile the run: positions whose kmer is a start kmer
            st = np.nonzero(is_start[locs])[0]
            u_here = uid[locs[st]]
            keep = uni_len[u_here] >= MIN_UNI_L
            occ_u.append(u_here[keep])
            occ_ref.append(np.full(int(keep.sum()), rid, dtype=np.int64))
            occ_off.append((s + st[keep]).astype(np.int64))
    if occ_u:
        occ_u = np.concatenate(occ_u)
        occ_ref = np.concatenate(occ_ref)
        occ_off = np.concatenate(occ_off)
    else:
        occ_u = occ_ref = occ_off = np.empty(0, dtype=np.int64)
    # stable ascending sort by unitig (see inverted ksort convention note)
    so = np.argsort(occ_u, kind="stable")
    occ_u, occ_ref, occ_off = occ_u[so], occ_ref[so], occ_off[so]
    n_occ = occ_u.size
    refpos_global = ref_offset[occ_ref] + occ_off
    refpos_refid = occ_ref.astype(np.int32)
    refpos_dir = np.ones(n_occ, dtype=np.uint8)  # FORWARD (lib/utils.h:66)

    # CSR with the reference's quirky overwrite layout (idx.c:678-698):
    # processing ascending blocks, ref_list[u] = block start for present u,
    # and ref_list[u+1] = end of u's block (overwriting u+1's own start).
    uni_reflist = np.zeros(n_uni + 1, dtype=np.int64)
    if n_occ:
        pu, pfirst, pcnt = np.unique(occ_u, return_index=True, return_counts=True)
        uni_reflist[pu] = pfirst
        uni_reflist[pu + 1] = pfirst + pcnt
    uni_reflist[n_uni] = n_occ  # dummy tail unitig (idx.c:700-703)

    # ---- step 9: exist-filter bitmaps ---------------------------------
    log("ekmer")
    ek = ek_params_for(n_kmer)
    ek0 = np.zeros(ek.size, dtype=np.uint8)
    ek1 = np.zeros(ek.size, dtype=np.uint8)
    # reconstruct unitig strings: char at (u, j<30) = start kmer base j,
    # char at (u, p+30) = low base of chain kmer at position p
    uni_start_off = np.concatenate([[0], np.cumsum(uni_len + 1)[:-1]])
    S = np.empty(L, dtype=np.uint8)
    S[uni_start_off + uni_len] = CODE_HASH
    S[uni_start_off[-1] + uni_len[-1]] = CODE_DOLLAR
    start_locs = np.nonzero(is_start)[0]
    sk = kv[start_locs]
    su_ = uid[start_locs]
    for jj in range(B_KMER - 1):
        S[uni_start_off[su_] + jj] = (
            (sk >> _U64(2 * (B_KMER - 1 - jj))) & _U64(3)
        ).astype(np.uint8)
    S[uni_start_off[uid] + pos + (B_KMER - 1)] = (kv & _U64(3)).astype(np.uint8)

    lek = ek.len_e_kmer
    hm = _U64(ek.hash_mask)
    ekmer_chunks = []
    for u0 in range(0, n_uni, 1 << 16):
        u1 = min(n_uni, u0 + (1 << 16))
        # windows for unitigs u0..u1: all lek-mers inside each unitig
        # flatten via global S positions
        st = uni_start_off[u0:u1]
        ln = uni_len[u0:u1]
        nwin = ln - lek + 1
        base = np.repeat(st, nwin)
        offs = np.concatenate([np.arange(n, dtype=np.int64) for n in nwin]) if len(nwin) else np.empty(0, np.int64)
        starts = base + offs
        if starts.size == 0:
            continue
        w = np.zeros(starts.size, dtype=_U64)
        for jj in range(lek):
            w = (w << _U64(2)) | S[starts + jj].astype(_U64)
        ekmer_chunks.append(w)
    if ekmer_chunks:
        allw = np.concatenate(ekmer_chunks)
        for tbl, hfun in ((ek0, hash64_1), (ek1, hash64_2)):
            h = hfun(allw) & hm
            np.bitwise_or.at(
                tbl,
                (h >> _U64(3)).astype(np.int64),
                (np.uint8(0x80) >> (h & _U64(7)).astype(np.uint8)),
            )

    return BuiltIndex(
        n_kmer=n_kmer,
        bwt_codes=bwt_codes,
        rank=rank,
        hash13=hash13,
        sa_uni=sa_uni,
        sa_off=sa_off,
        dollar_pos=dollar_pos,
        uni_len=uni_len,
        uni_reflist=uni_reflist,
        refpos_global=refpos_global,
        refpos_refid=refpos_refid,
        refpos_dir=refpos_dir,
        ref_names=ref_names,
        ref_len=ref_len_arr,
        ref_offset=ref_offset,
        ref_bin=ref_bin,
        ref_total=total,
        ek=ek,
        ek0=ek0,
        ek1=ek1,
    )
