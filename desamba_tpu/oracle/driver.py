"""Per-read classify driver + SAM formatting.

classify_seq (cly.c:3059-3127) and output_one_result_sam (cly_mt.c:229-327).
The per-worker buffer state (max_read_l, which flips the NGS/3G filter mode,
cly.c:2953-2981) persists across reads like a single-thread run of the
reference (`classify -t 1`).
"""
from __future__ import annotations

import numpy as np

from ..constants import DEFAULT_MAX_SEC_N, MIN_READ_LEN
from .classify import (
    FORWARD,
    OracleIndex,
    ReadResult,
    fast_classify,
    get_island,
    resolve_tree,
    slow_classify,
    u32,
    i32,
)
from .rescore import OracleAbort, delete_small_score_rst, detect_primary


class OracleClassifier:
    def __init__(self, idx: OracleIndex):
        self.idx = idx
        self.buff = {"max_read_l": 0}
        # BUFF_REALLOC growth state of buff->bin_read (lib/utils.h:117-122):
        # the buffer only grows, so the malloc chunk header bytes before it
        # depend on the largest read seen so far
        self.m_bin_read = 0

    def _bin2_prepad(self, read_len: int) -> bytes:
        if 2 * read_len > self.m_bin_read:
            self.m_bin_read = 2 * read_len + 20
        # glibc chunk: size = align16(req + 8), min 32, PREV_INUSE set
        csz = max(32, (self.m_bin_read + 8 + 15) & ~15) | 1
        return csz.to_bytes(8, "little")

    def classify_read(self, name: str, seq: bytes, qual: bytes | None) -> ReadResult:
        idx = self.idx
        result = ReadResult(name=name, seq=seq, qual=qual or b"")
        read_len = len(seq)
        anchors: list = []
        if read_len < MIN_READ_LEN:
            return result
        sd0, sd1, bin2 = get_island(idx, seq)
        # offsets of each direction's bin read inside the combined 2L buffer
        off = {FORWARD: 0, 1 - FORWARD: read_len}
        both_direction = u32(sd0.total_score - sd1.total_score) <= (
            u32(sd0.total_score) >> 3
        )
        super_repeat = fast_classify(
            idx, sd0, bin2, off[sd0.direction], read_len, anchors
        )
        if both_direction:
            super_repeat += fast_classify(
                idx, sd1, bin2, off[sd1.direction], read_len, anchors
            )
        resolve_tree(result, anchors)
        run_slow = False
        if len(result.hits) <= 0:
            run_slow = True
        elif result.hits[0].anchor_number < 5 and super_repeat < 3:
            run_slow = True
            if read_len <= 300 and result.hits[0].sum_score > 200:
                run_slow = False
        if run_slow:
            anchors = []
            slow_classify(idx, sd0, bin2, off[sd0.direction], read_len, anchors)
            resolve_tree(result, anchors)
            result.fast_classify = False
            if (
                both_direction
                or len(result.hits) <= 0
                or (result.hits[0].anchor_number < 5 and super_repeat < 3)
            ):
                slow_classify(idx, sd1, bin2, off[sd1.direction], read_len, anchors)
                resolve_tree(result, anchors)
        result.n_anchor = len(anchors)
        from .rescore import CBuf

        bin2c = CBuf(bin2, self._bin2_prepad(read_len))
        delete_small_score_rst(idx, result, sd0, sd1, self.buff, bin2c, off)
        detect_primary(result.hits, read_len)
        return result


def format_sam(idx: OracleIndex, r: ReadResult, output_seq: bool,
               max_sec_n: int = DEFAULT_MAX_SEC_N) -> str:
    """output_one_result_sam (cly_mt.c:229-327), byte-for-byte."""
    out = []
    seq_s = r.seq.decode() if output_seq else "*"
    qual_s = (r.qual.decode() if r.qual else "") if output_seq else "*"
    if not r.hits:
        out.append(f"{r.name}\t4\t*\t0\t0\t*\t*\t0\t0\t{seq_s}\t{qual_s}\t\n")
        return "".join(out)
    read_l = len(r.seq)
    c_s = r.hits[0]
    flag = 0 if c_s.direction else 0x10
    if len(r.hits) == 1 or u32(c_s.sum_score - r.hits[1].sum_score) > 5:
        mapq_pri = 30
    else:
        mapq_pri = i32(u32(c_s.sum_score - r.hits[1].sum_score) << 2)
    name0 = idx.ref_names[c_s.ref_ID]
    out.append(
        f"{r.name}\t{flag}\t{name0}\t{i32(c_s.t_st)}\t{mapq_pri}\t"
        f"{i32(c_s.q_st)}S{i32(u32(c_s.q_ed - c_s.q_st))}M{i32(u32(read_l - c_s.q_ed))}S\t"
        f"*\t0\t0\t{seq_s}\t{qual_s}\tAS:i:{i32(c_s.sum_score)}\t\n"
    )
    for loop in (0, 1):
        for c in r.hits[1:]:
            show = False
            flag = 0 if c.direction else 0x10
            mapq = 0
            if loop == 0 and c.pri_index == 0:
                show = True
                flag += 0x800
                mapq = min(30, mapq_pri)
            elif loop == 1 and 0 < c.pri_index <= max_sec_n:
                show = True
                flag += 0x100
            if show:
                hs = "H" if loop == 0 else "S"
                out.append(
                    f"{r.name}\t{flag}\t{idx.ref_names[c.ref_ID]}\t{i32(c.t_st)}\t{mapq}\t"
                    f"{i32(c.q_st)}{hs}{i32(u32(c.q_ed - c.q_st))}M{i32(u32(read_l - c.q_ed))}{hs}\t"
                    f"*\t0\t0\t*\t*\tAS:i:{i32(c.sum_score)}\t\n"
                )
    return "".join(out)


def classify_file_to_sam(idx: OracleIndex, reads, output_seq=False,
                         max_sec_n=DEFAULT_MAX_SEC_N, on_abort="raise"):
    """Classify an iterable of (name, seq, qual); returns SAM text.

    on_abort: 'raise' or 'skip' for reads where the reference would crash."""
    cl = OracleClassifier(idx)
    out = []
    for name, seq, qual in reads:
        try:
            r = cl.classify_read(name, seq, qual)
        except OracleAbort:
            if on_abort == "raise":
                raise
            continue
        out.append(format_sam(idx, r, output_seq, max_sec_n))
    return "".join(out)
