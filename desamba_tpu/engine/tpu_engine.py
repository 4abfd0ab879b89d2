"""Batched classify engine: device compute + exact host replay.

Per batch of reads the device runs three kinds of large lockstep dispatches:
  1. exist-filter probe of every e-kmer of both strands    (ops/ekmer.py)
  2. FM interval searches for ALL candidate seed positions, speculative
     over the adaptive j-stepping of fast/slow classify    (ops/fm.py)
  3. row walks (single-row backward extensions) with row traces

The host then *replays* the reference's exact control flow (island
stepping, sp_set dedup applied to the walk traces, anchor mapping,
chaining, M2 rescoring, filtering, primary detection) consuming the
precomputed device results. Replay falls back to the oracle's scalar FM
for the rare cases a device result can't cover (trace overflow, missing
candidate), so the SAM output stays bit-identical to the reference by
construction. Speculation wastes ~2-3x the minimal FM work but turns the
latency-bound pointer chase of cly.c:1383-1442 into large batched gathers.

ROLE (decided in r2, measured in bench.py bench_exact_paths): this hybrid
is the VALIDATION path — it proves the device FM kernels reproduce the
reference bit-for-bit. Its per-read Python replay makes it ~20-50x slower
than the C++ engine, so production bit-exact serving (`Engine`'s
read_classify, engine/api.py) uses engine/native.py, and throughput
serving uses engine/fast_engine.py (device pipeline + native fallback).
"""
from __future__ import annotations

from collections import defaultdict
from dataclasses import dataclass

import numpy as np


def _pow2(n: int, lo: int = 32) -> int:
    v = lo
    while v < n:
        v <<= 1
    return v

from ..constants import (
    MEM_SEARCH_FAST,
    MEM_SEARCH_SLOW,
    MIN_MEM_LEN_FAST,
    MIN_MEM_LEN_SLOW,
    MIN_READ_LEN,
    PRE_IDX_MASK,
    SEED_RANGE,
)
from ..index.tensor_index import from_oracle_index
from ..oracle import classify as ocl
from ..oracle.classify import (
    FORWARD,
    MemRst,
    OracleIndex,
    ReadResult,
    SearchDir,
    SpSet,
    map_seed,
    resolve_tree,
    search_exist_kmer_m2,
)
from ..oracle.cqsort import qsort_list
from ..oracle.driver import format_sam
from ..oracle.rescore import CBuf, delete_small_score_rst, detect_primary


@dataclass
class _Cand:
    """One speculative bwt_MEM_search call (positions lane-local)."""

    lane: int
    s_local: int  # rightmost pattern char within the direction's read
    s_off: int  # direction base offset within the lane's bin2 row
    pre_v: int
    l_min: int
    max_rst: int


def _build_sd(exists, bin_read, kmers, direction) -> SearchDir:
    """get_seed_vector_M2 top-marking from device probe output
    (cly.c:1157-1229)."""
    seeds = search_exist_kmer_m2(exists, direction)
    total_score = 0
    max_index, max_length, index_end = 0, 0, SEED_RANGE
    n_kmer = exists.size
    if seeds:
        for m, s in enumerate(seeds):
            s[2] = 0
            posk = s[0] if direction == FORWARD else (n_kmer - s[0] - s[1])
            if posk < index_end:
                if max_length < s[1]:
                    max_length = s[1]
                    max_index = m
                seeds[max_index][2] = 0
            else:
                seeds[max_index][2] = 1
                index_end += SEED_RANGE
                total_score += max_length
                max_index = m
                max_length = s[1]
        seeds[max_index][2] = 1
        total_score += max_length
    return SearchDir(seeds, bin_read, kmers, direction, total_score & 0xFFFFFFFF)


class TpuClassifier:
    def __init__(self, oi: OracleIndex, sub_batch: int = 256):
        from ..ops.ekmer import EkArrays
        from ..ops.fm import FmArrays

        self.oi = oi
        ti = from_oracle_index(oi)
        self.fm = FmArrays(ti)
        self.ek = EkArrays(ti)
        self.sub_batch = sub_batch
        self.stats = defaultdict(int)

    def new_session(self):
        return _Session(self)

    # ---------------------------------------------------------- probes ----
    def _probe_batch(self, reads):
        from ..ops.ekmer import probe_reads

        lek = self.oi.ek.len_e_kmer
        lens = np.array([len(s) for _, s, _ in reads], dtype=np.int32)
        W = _pow2(max(int(lens.max()), lek + 1), 64)  # shape bucket: no recompiles
        B = len(reads)
        fc = np.zeros((B, W), np.uint8)
        rc = np.zeros((B, W), np.uint8)
        bin2s = []
        for i, (_, seq, _) in enumerate(reads):
            f = codec_seq(seq)
            r = (3 - f[::-1]).astype(np.uint8)
            fc[i, : f.size] = f
            rc[i, : r.size] = r
            bin2s.append(np.concatenate([f, r]))
        codes = np.concatenate([fc, rc], axis=0)
        lengths = np.concatenate([lens, lens])
        ex = np.asarray(probe_reads(self.ek, codes, lengths))
        return bin2s, ex[:B], ex[B:], lens

    # ------------------------------------------------------- fm batches ----
    def _run_fm(self, cands: list[_Cand], bin2_mat):
        import jax.numpy as jnp

        from ..ops.fm import interval_search, row_walks

        if not cands:
            return []
        oi = self.oi
        nC = len(cands)
        nP = _pow2(nC)  # shape bucket: pad with empty-interval dummies
        s_idx = np.full(nP, 13, np.int32)
        sp0 = np.zeros(nP, np.int32)
        ep0 = np.zeros(nP, np.int32)
        lanes = np.zeros(nP, np.int32)
        l_min = np.full(nP, 20, np.int32)
        l_max = np.full(nP, 13, np.int32)
        max_rst = np.full(nP, 2, np.int32)
        s_idx[:nC] = [c.s_off + c.s_local for c in cands]
        sp0[:nC] = [oi.hash13[c.pre_v] for c in cands]
        ep0[:nC] = [oi.hash13[c.pre_v + 1] for c in cands]
        lanes[:nC] = [c.lane for c in cands]
        l_min[:nC] = [c.l_min for c in cands]
        l_max[:nC] = [c.s_local for c in cands]
        max_rst[:nC] = [c.max_rst for c in cands]
        mat = bin2_mat[lanes]
        res = interval_search(
            self.fm, jnp.asarray(mat), 0, s_idx, sp0, ep0,
            jnp.asarray(max_rst), jnp.asarray(l_min), jnp.asarray(l_max),
        )
        nsp = np.asarray(res["sp"])
        nep = np.asarray(res["ep"])
        ml = np.asarray(res["match_len"])
        stt = np.asarray(res["status"])
        ptr = np.asarray(res["ptr"])  # global within the lane's bin2 row
        self.stats["fm_searches"] += len(cands)
        walk_rows, walk_ptr, walk_max, walk_owner = [], [], [], []
        for i, c in enumerate(cands[:nC] if True else cands):
            if stt[i] == 1 or nsp[i] >= nep[i]:
                continue
            for row in range(int(nsp[i]), int(nep[i])):
                walk_rows.append(row)
                walk_ptr.append(int(ptr[i]))
                walk_max.append(max(0, c.s_local - int(ml[i])))
                walk_owner.append(i)
        walks_by_cand = defaultdict(dict)
        if walk_rows:
            self.stats["fm_walks"] += len(walk_rows)
            nW = len(walk_rows)
            nWP = _pow2(nW)
            wrows = np.zeros(nWP, np.int32)
            wptr = np.full(nWP, -1, np.int32)
            wmax = np.zeros(nWP, np.int32)
            wown = np.zeros(nWP, np.int32)
            wrows[:nW] = walk_rows
            wptr[:nW] = walk_ptr
            wmax[:nW] = walk_max
            wown[:nW] = walk_owner
            wr = row_walks(
                self.fm, jnp.asarray(mat[wown]),
                wrows, wptr, wmax,
            )
            steps = np.asarray(wr["steps"])
            trace = np.asarray(wr["trace"])
            over = np.asarray(wr["overflow"])
            stop_max = np.asarray(wr["stop_max"])
            for k, i in enumerate(walk_owner):
                walks_by_cand[i][walk_rows[k]] = dict(
                    steps=int(steps[k]), trace=trace[k],
                    overflow=bool(over[k]), stop_max=bool(stop_max[k]),
                )
        out = []
        for i, c in enumerate(cands):
            out.append(
                dict(status=int(stt[i]), nsp=int(nsp[i]), nep=int(nep[i]),
                     match_len=int(ml[i]), ptr=int(ptr[i]),
                     walks=walks_by_cand.get(i, {}))
            )
        return out

    # ---------------------------------------------------------- replay ----
    def _replay_mem_search(self, dev, cand: _Cand, bin2, sp_set: SpSet, out):
        """bwt_MEM_search tail (cly.c:1418-1441) from device outputs."""
        if dev["status"] == 1:
            return 0
        nsp, nep = dev["nsp"], dev["nep"]
        if nsp >= nep:
            return 0
        n0 = len(out)
        ml = dev["match_len"]
        single = nsp + 1 == nep
        for row in range(nsp, nep):
            if not sp_set.insert(row):
                if single:
                    return 0
                continue
            w = dev["walks"].get(row)
            if w is None or w["overflow"]:
                self.stats["walk_fallback"] += 1
                m = MemRst()
                ocl.bwt_single_search(self.oi, row, dev["ptr"], bin2,
                                      max(0, cand.s_local - ml), sp_set, m)
            else:
                m = self._walk_from_trace(row, w, sp_set)
            m.match_len += ml + 1
            if m.match_len >= cand.l_min:
                out.append(m)
        return len(out) - n0

    @staticmethod
    def _walk_from_trace(start_row, w, sp_set: SpSet) -> MemRst:
        m = MemRst()
        steps = w["steps"]
        trace = w["trace"]
        for k in range(steps):  # dedup replay (cly.c:1366-1371)
            if not sp_set.insert(int(trace[k])):
                m.match_len = -1000
                return m
        visited = [start_row] + [int(trace[k]) for k in range(steps)]
        sa_rows = visited if not w["stop_max"] else visited[:-1]
        sa_sp, sa_sp_l = -1, 0
        for v in sa_rows:  # sa tracking (cly.c:1353-1359)
            if v % 8 == 0:
                sa_sp, sa_sp_l = v, 0
            else:
                sa_sp_l -= 1
        m.sp = visited[-1]
        m.match_len = steps
        m.sa_sp = sa_sp
        m.sa_sp_l = sa_sp_l
        return m

    # --------------------------------------------------------- classify ----
    def _collect(self, mode, which_dirs, sds, lens, lek):
        cands, keys = [], []
        min_index = MIN_MEM_LEN_FAST - lek
        for i in range(len(lens)):
            if lens[i] < MIN_READ_LEN or not which_dirs[i]:
                continue
            for dpos in which_dirs[i]:
                sd = sds[i][dpos]
                off = 0 if sd.direction == FORWARD else int(lens[i])
                for si, s in enumerate(sd.seeds):
                    if mode == "fast":
                        if not s[2]:
                            continue
                        lo = min_index
                        l_min, max_rst = MIN_MEM_LEN_FAST - 1, MEM_SEARCH_FAST
                    else:
                        if s[1] < 3 and not (sd.seeds[0][2] if sd.seeds else 0):
                            continue
                        lo = 1
                        l_min = min(MIN_MEM_LEN_SLOW - 1, lek + 1)
                        max_rst = MEM_SEARCH_SLOW
                    for j in range(lo, s[1]):
                        kidx = s[0] + j
                        pv = int(sd.kmers[kidx] & np.uint64(PRE_IDX_MASK))
                        sidx = kidx + lek - 1
                        cands.append(_Cand(i, sidx, off, pv, l_min, max_rst))
                        keys.append((i, dpos, si, j, mode))
        return cands, keys

    def _classify_sub(self, reads):
        oi = self.oi
        lek = oi.ek.len_e_kmer
        bin2s, exF, exR, lens = self._probe_batch(reads)
        B = len(reads)
        sds = []
        for i in range(B):
            L = int(lens[i])
            if L < lek + 1:
                sds.append(None)
                continue
            n_kmer = L - lek + 1
            f = bin2s[i][:L]
            r = bin2s[i][L:]
            kf = ocl.store_kmers(f, n_kmer, lek, oi.ek.single_base_max)
            kr = ocl.store_kmers(r, n_kmer, lek, oi.ek.single_base_max)
            sd0 = _build_sd(exF[i][:n_kmer], f, kf, FORWARD)
            sd1 = _build_sd(exR[i][:n_kmer], r, kr, 1 - FORWARD)
            if sd0.total_score < sd1.total_score:
                sd0, sd1 = sd1, sd0
            sds.append((sd0, sd1))
        W2 = max(b.size for b in bin2s)
        bin2_mat = np.full((B, W2), 255, np.int32)
        for i, b in enumerate(bin2s):
            bin2_mat[i, : b.size] = b

        both = [False] * B
        fast_dirs = [[] for _ in range(B)]
        for i in range(B):
            if sds[i] is None or lens[i] < MIN_READ_LEN:
                continue
            sd0, sd1 = sds[i]
            both[i] = ((sd0.total_score - sd1.total_score) & 0xFFFFFFFF) <= (
                sd0.total_score >> 3
            )
            fast_dirs[i] = [0, 1] if both[i] else [0]
        cands, keys = self._collect("fast", fast_dirs, sds, lens, lek)
        fast_tab = dict(zip(keys, self._run_fm(cands, bin2_mat)))

        results = []
        anchors_by_read = {}
        sr_by_read = {}
        slow_needed = []
        for i, (name, seq, qual) in enumerate(reads):
            res = ReadResult(name=name, seq=seq, qual=qual or b"")
            results.append(res)
            if lens[i] < MIN_READ_LEN or sds[i] is None:
                continue
            anchors = []
            sr = self._fast_replay(i, 0, sds, bin2s[i], int(lens[i]), fast_tab, anchors)
            if both[i]:
                sr += self._fast_replay(i, 1, sds, bin2s[i], int(lens[i]), fast_tab, anchors)
            resolve_tree(res, anchors)
            run_slow = False
            if len(res.hits) <= 0:
                run_slow = True
            elif res.hits[0].anchor_number < 5 and sr < 3:
                run_slow = True
                if lens[i] <= 300 and res.hits[0].sum_score > 200:
                    run_slow = False
            anchors_by_read[i] = anchors
            sr_by_read[i] = sr
            if run_slow:
                slow_needed.append(i)

        if slow_needed:
            slow_dirs = [[] for _ in range(B)]
            for i in slow_needed:
                slow_dirs[i] = [0, 1]  # speculate both directions
            cands, keys = self._collect("slow", slow_dirs, sds, lens, lek)
            slow_tab = dict(zip(keys, self._run_fm(cands, bin2_mat)))
            for i in slow_needed:
                res = results[i]
                anchors = []
                self._slow_replay(i, 0, sds, bin2s[i], int(lens[i]), slow_tab, anchors)
                resolve_tree(res, anchors)
                res.fast_classify = False
                if (
                    both[i]
                    or len(res.hits) <= 0
                    or (res.hits[0].anchor_number < 5 and sr_by_read[i] < 3)
                ):
                    self._slow_replay(i, 1, sds, bin2s[i], int(lens[i]), slow_tab, anchors)
                    resolve_tree(res, anchors)
                anchors_by_read[i] = anchors
        for i, res in enumerate(results):
            res.n_anchor = len(anchors_by_read.get(i, []))
        return results, sds, bin2s, lens

    def _fast_replay(self, i, dpos, sds, bin2, read_len, tab, anchors):
        """fast_classify (cly.c:1471-1541) consuming device FM results."""
        oi = self.oi
        lek = oi.ek.len_e_kmer
        min_index = MIN_MEM_LEN_FAST - lek
        sd = sds[i][dpos]
        off = 0 if sd.direction == FORWARD else read_len
        sp_set = SpSet()
        sv = sd.seeds
        ci = 0
        read_view = bin2[off : off + read_len]
        while ci < len(sv):
            c_sv = sv[ci]
            if not c_sv[2]:
                ci += 1
                continue
            sp_set.reset()
            a_b_idx = len(anchors)
            j = c_sv[1] - 1
            while j >= min_index:
                kidx = c_sv[0] + j
                sidx = kidx + lek - 1
                dev = tab.get((i, dpos, ci, j, "fast"))
                mr: list[MemRst] = []
                if dev is None:
                    self.stats["cand_fallback"] += 1
                    pv = int(sd.kmers[kidx] & np.uint64(PRE_IDX_MASK))
                    ocl.bwt_mem_search(oi, bin2, off + sidx, pv, MEM_SEARCH_FAST,
                                       MIN_MEM_LEN_FAST - 1, sidx, sp_set, mr)
                    n = len(mr)
                else:
                    cand = _Cand(i, sidx, off, 0, MIN_MEM_LEN_FAST - 1, MEM_SEARCH_FAST)
                    n = self._replay_mem_search(dev, cand, bin2, sp_set, mr)
                if n == 0:
                    j -= 2
                    continue
                j -= 3
                max_score = 0
                for m in mr:
                    m.read_offset = sidx - m.match_len
                    s = map_seed(oi, m, read_view, read_len, ci, sd.direction, anchors)
                    max_score = max(s, max_score)
                if max_score > 35:
                    j -= 7
                if max_score > 256:
                    if max_score > 512:
                        ci += 1
                    break
            top = 35
            for a in anchors[a_b_idx:]:
                top = max(top, a.score)
            for a in anchors[a_b_idx:]:
                a.anchor_useless = 1 if a.score < top else 0
            ci += 1
        return 0  # super_repeat counters are dead code in the reference

    def _slow_replay(self, i, dpos, sds, bin2, read_len, tab, anchors):
        """slow_classify (cly.c:1543-1606) consuming device FM results."""
        oi = self.oi
        lek = oi.ek.len_e_kmer
        sd = sds[i][dpos]
        off = 0 if sd.direction == FORWARD else read_len
        sp_set = SpSet()
        sv = sd.seeds
        read_view = bin2[off : off + read_len]
        for si, c_sv in enumerate(sv):
            if c_sv[1] < 3 and not (sv[0][2] if sv else 0):
                continue
            min_match_len = min(MIN_MEM_LEN_SLOW - 1, lek + 1)
            sp_set.reset()
            mr: list[MemRst] = []
            j = c_sv[1] - 1
            while j >= 1:
                kidx = c_sv[0] + j
                sidx = kidx + lek - 1
                dev = tab.get((i, dpos, si, j, "slow"))
                n0 = len(mr)
                if dev is None:
                    self.stats["cand_fallback"] += 1
                    pv = int(sd.kmers[kidx] & np.uint64(PRE_IDX_MASK))
                    ocl.bwt_mem_search(oi, bin2, off + sidx, pv, MEM_SEARCH_SLOW,
                                       min_match_len, sidx, sp_set, mr)
                else:
                    cand = _Cand(i, sidx, off, 0, min_match_len, MEM_SEARCH_SLOW)
                    self._replay_mem_search(dev, cand, bin2, sp_set, mr)
                for m in mr[n0:]:
                    m.read_offset = sidx - m.match_len
                j -= 2
            if not mr:
                continue
            if len(mr) > 1:
                mr = qsort_list(mr, ocl.SZ_MEMRST, lambda a, b: b.match_len - a.match_len)
            a_b_idx = len(anchors)
            for m in mr[: min(len(mr), MEM_SEARCH_SLOW)]:
                map_seed(oi, m, read_view, read_len, si, sd.direction, anchors)
            top = 35
            for a in anchors[a_b_idx:]:
                top = max(top, a.score)
            for a in anchors[a_b_idx:]:
                a.anchor_useless = 1 if a.score < top else 0

    # ------------------------------------------------------------- API ----
    def classify_results(self, reads, buff=None, m_bin=None) -> list:
        """Full classify flow (speculate -> replay -> rescore -> primary)
        returning result objects. `buff`/`m_bin` carry the RM_buffer state
        (max_read_l filter mode, bin-buffer growth, cly_mt.c:963-1006)
        across calls when a persistent session passes them in."""
        oi = self.oi
        out = []
        buff = buff if buff is not None else {"max_read_l": 0}
        m_bin = m_bin if m_bin is not None else [0]

        def prepad(read_len):
            if 2 * read_len > m_bin[0]:
                m_bin[0] = 2 * read_len + 20
            csz = max(32, (m_bin[0] + 8 + 15) & ~15) | 1
            return csz.to_bytes(8, "little")

        for s0 in range(0, len(reads), self.sub_batch):
            chunk = reads[s0 : s0 + self.sub_batch]
            results, sds, bin2s, lens = self._classify_sub(chunk)
            for k, res in enumerate(results):
                if lens[k] >= MIN_READ_LEN and sds[k] is not None:
                    sd0, sd1 = sds[k]
                    off = {FORWARD: 0, 1 - FORWARD: int(lens[k])}
                    bin2c = CBuf(bin2s[k], prepad(int(lens[k])))
                    delete_small_score_rst(oi, res, sd0, sd1, buff, bin2c, off)
                    detect_primary(res.hits, int(lens[k]))
                out.append(res)
        return out

    def classify_to_sam(self, reads, output_seq=False, max_sec_n=5) -> str:
        return "".join(
            format_sam(self.oi, res, output_seq, max_sec_n)
            for res in self.classify_results(reads))


class _Session:
    """Per-thread_id session for the Engine API: persistent RM_buffer
    state (max_read_l filter mode survives across read_classify calls,
    cly_mt.c:963-1006), full rescore + primary detection per batch."""

    def __init__(self, cl: TpuClassifier):
        self.cl = cl
        self.buff = {"max_read_l": 0}
        self.m_bin = [0]

    def classify_batch(self, reads) -> list:
        return self.cl.classify_results(reads, self.buff, self.m_bin)


def codec_seq(seq):
    from ..utils import codec

    return codec.seq_to_codes(seq, codec.CLY_BIT)
