"""Taxonomic abundance analysis — both report formats of the reference.

  * CLI `analysis ana_meta` (analysis.c:1390-1519, ana_meta_des:1898-1910):
    SAM -> RST temp -> per-read tid -> tree weights -> indented rank tree.
  * `.so` meta_analysis (cly_mt.c:1083-1235, 1329-1413): SAM_FULL string ->
    human snapshot + leaf report lines -> normalization + top-3 selection.

Float rates follow the reference exactly: float32 arithmetic, printf "%f".
"""
from __future__ import annotations

import io
from dataclasses import dataclass

import numpy as np

from ..constants import ANIMAL_PLANT_TIDS, HUMAN_TIDS, META_USE_BASE_NUM
from ..io.taxonomy import MAX_U32, Taxonomy
from ..oracle.cqsort import qsort_perm

SZ_COUNT_SORT = 16


@dataclass
class Rst:
    read_name: str
    is_classify: str
    tid: int
    read_length: int
    mapq: int
    score: int
    seq: str | None = None


def f32(x) -> float:
    return float(np.float32(x))


def fdiv(a, b) -> float:
    """Single-precision a/b with C semantics (0/0 -> -nan, x/0 -> inf)."""
    with np.errstate(divide="ignore", invalid="ignore"):
        return float(np.float32(a) / np.float32(b))


def fmul(a, b) -> float:
    with np.errstate(invalid="ignore"):
        return float(np.float32(a) * np.float32(b))


def _fmt_f(x: float) -> str:
    """printf %f of a float32 value (glibc nan/inf spellings)."""
    x = float(np.float32(x))
    if x != x:
        return "-nan" if np.signbit(np.float32(x)) else "nan"
    return f"{x:f}"


# ------------------------------------------------------------ SAM parse ----
def parse_sam_line_cli(line: str) -> Rst | None:
    """getOneSAM, analysis-CLI flavor (analysis.c:191-295): read_length from
    CIGAR (M/I/S/X), no sequence kept."""
    if not line.strip("\n"):
        line = line  # getline returns empty lines too; fall through
    f = line.rstrip("\n").split("\t")
    if len(f) < 3:
        return None
    name = f[0]
    if f[2] == "*" or f[2].startswith("*"):
        return Rst(name, "U", 0, 0, 0, 0)
    mapq = int(f[4]) if len(f) > 4 else 0
    cigar = f[5] if len(f) > 5 else ""
    score = 0
    opts = f[11:] if len(f) > 11 else []
    if opts:
        tag = opts[0][:2]
        if tag in ("AS", "NM"):
            try:
                score = int(opts[0].split(":")[2])
            except (IndexError, ValueError):
                score = 0
            if len(opts) > 1 and opts[1][:2] == "ms":
                try:
                    score = int(opts[1].split(":")[2])
                except (IndexError, ValueError):
                    pass
    parts = f[2].split("|")
    tid = int(parts[1]) if len(parts) > 1 and parts[1].isdigit() else 0
    # read length from CIGAR (M/I/S/X); a '-' flushes the accumulator, so
    # the reference's negative ops like "-1S" contribute their digits only
    rl = 0
    num = 0
    for ch in cigar:
        if "0" <= ch <= "9":
            num = num * 10 + ord(ch) - 48
        else:
            if ch in "MISX":
                rl += num
            num = 0
    return Rst(name, "C", tid, rl, mapq, score)


def parse_sam_line_engine(line: str) -> Rst | None:
    """getOneSAM, engine flavor (cly_mt.c:687-813): read_length =
    strlen(SEQ); sequence kept (for the human snapshot)."""
    f = line.rstrip("\n").split("\t")
    if len(f) < 3:
        return None
    name = f[0]
    if f[2].startswith("*"):
        seq = f[9] if len(f) > 9 else ""
        return Rst(name, "U", 0, len(seq), 0, 0, seq)
    mapq = int(f[4]) if len(f) > 4 else 0
    # The engine's option parse re-tokenizes from an already NUL-split
    # region (strtok(cursor,"\t") after strtok(NULL,":") consumed "AS"/"i",
    # cly_mt.c:754-775), so strtoul sees the tag text and the score is
    # ALWAYS 0. Downstream this makes ana_get_tid treat every SAM line as
    # its own read group (score==0 break, cly_mt.c:939-940).
    score = 0
    parts = f[2].split("|")
    tid = int(parts[1]) if len(parts) > 1 and parts[1].isdigit() else 0
    seq = f[9] if len(f) > 9 else ""
    return Rst(name, "C", tid, len(seq), mapq, score, seq)


def iter_sam(text: str, flavor="cli"):
    parse = parse_sam_line_cli if flavor == "cli" else parse_sam_line_engine
    started = False
    for line in text.splitlines():
        if not started and line.startswith("@"):
            continue
        started = True
        if line == "":
            continue
        r = parse(line)
        if r is not None:
            yield r


# ------------------------------------------------------------ per-read ----
def ana_get_tid_stream(rsts: list[Rst], i: int, tax: Taxonomy, flavor="engine"):
    """ana_get_tid (analysis.c:1329-1389 / cly_mt.c:902-961).

    rsts[i] is the primary line of a read; returns (final_tid, next_i).
    On EOF mid-scan the CLI variant returns 0 (analysis.c:1363, dropping the
    last read) while the engine variant returns the tid (cly_mt.c:933)."""
    rst = rsts[i]
    if rst.is_classify != "C":
        return 0, i + 1
    tid = 0
    score = 0
    if rst.tid <= tax.max_tid:
        tid = rst.tid
        score = rst.score
    name = rst.read_name
    j = i + 1
    while True:
        if j >= len(rsts):
            return (0 if flavor == "cli" else tid), j
        nxt = rsts[j]
        if nxt.read_name != name:
            break
        if score == 0:
            break
        if nxt.score != score:
            j += 1
            continue
        if nxt.tid > tax.max_tid:
            j += 1
            continue
        p = nxt.tid
        while True:
            if p == tid:
                tid = nxt.tid
                break
            if p < 1 or p == MAX_U32:
                break
            p = tax.p_tid(p)
        j += 1
    return tid, j


# --------------------------------------------------------- tree weights ----
class WeightTree:
    """node weights + ordered child lists (the child_list chained array of
    cly_mt.c:1192-1222 / analysis.c:1475-1505)."""

    def __init__(self):
        self.weight: dict[int, int] = {}
        self.children: dict[int, list[int]] = {}

    def add_child(self, p, c):
        lst = self.children.setdefault(p, [])
        if c not in lst:
            lst.append(c)


def _sorted_counts(node_count: dict[int, int], elem_size: int = SZ_COUNT_SORT):
    """Counts in the order cmp_count_sort + glibc qsort produce
    (0/1 comparator -> descending by count, ties in tid order)."""
    items = sorted(node_count.items())  # ascending tid (array scan order)
    items = [(t, c) for t, c in items if (c[0] if isinstance(c, tuple) else c) != 0]
    perm = qsort_perm(
        len(items), elem_size,
        lambda a, b: 1 if _w(items[a][1]) < _w(items[b][1]) else 0,
    )
    return [items[k] for k in perm]


def _w(v):
    """weight of a count entry: plain int or (base, mapq) tuple."""
    return v[0] if isinstance(v, tuple) else v


def ana_meta_report(sam_text: str, tax: Taxonomy, sam_path_label: str,
                    print_list: bool = False) -> str:
    """CLI `analysis ana_meta <sam> <nodes.dmp>` stdout, byte-for-byte
    (ana_meta_des -> dump_des_sam_file -> ana_meta, analysis.c)."""
    rsts = list(iter_sam(sam_text, "cli"))
    return ana_meta_report_from_rsts(rsts, tax, sam_path_label + ".temp",
                                     print_list)


def _cli_leaf_line(out, tax, node_id, rate):
    """ana_meta_loop_fprint leaf line, CLI flavor (analysis.c:1236-1289):
    species type, tid|rank, raw rate (weight/total, not percent)."""
    st = species_type_of(node_id, tax)
    out.write(f"{st}\t{node_id}|{tax.rank[node_id]}\tnull\t{_fmt_f(rate)}\n")


def _print_tree(out, tax, tree, total, print_list, is_base, mapq=None,
                err=None):
    """ana_meta_loop_print (analysis.c:1292-1317) or, with print_list, the
    leaf-only ana_meta_loop_fprint (analysis.c:1236-1289), from root tid 1."""
    if print_list:
        import sys as _sys

        err = err or _sys.stderr

        def rec(node_id, level):
            w = tree.weight.get(node_id, 0)
            if w == 0:
                return
            kids = tree.children.get(node_id, [])
            if kids:
                for ch in kids:
                    rec(ch, level + 1)
            else:
                rate = fdiv(w, total)
                _cli_leaf_line(out, tax, node_id, rate)
                # DEBUG stderr echo (analysis.c:1285-1288; DEBUG=1, desc.h:4)
                st = species_type_of(node_id, tax)
                err.write("  " * level)
                err.write(
                    f"DEBUG: {st}\t{node_id}|{tax.rank[node_id]}\tnull\t"
                    f"{_fmt_f(rate)}\n"
                )

        rec(1, 0)
        return

    def rec(node_id, level):
        w = tree.weight.get(node_id, 0)
        rate = fmul(fdiv(w, total), 100)
        if is_base:
            mq = fmul(fdiv(mapq.get(node_id, 0) if mapq else 0, w), rate)
        if rate < 0.01:  # False for nan, like the C (analysis.c:1297)
            return
        out.write("|" * level)
        if is_base:
            out.write(
                f"{tax.rank[node_id]} TID:{node_id}  {_fmt_f(rate)}%, "
                f"mapQ:{_fmt_f(mq)}\n"
            )
        else:
            out.write(f"{tax.rank[node_id]} TID:{node_id}  {_fmt_f(rate)}%\n")
        for ch in tree.children.get(node_id, []):
            rec(ch, level + 1)

    rec(1, 0)


def _build_tree(node_count, tax, elem_size, with_mapq=False):
    """Tree weight propagation (analysis.c:1475-1505): leaves in qsort order,
    weights lifted to every ancestor, ordered child lists."""
    tree = WeightTree()
    mapq: dict[int, int] = {}
    for tid, cnt in _sorted_counts(node_count, elem_size):
        w = _w(cnt)
        q = cnt[1] if isinstance(cnt, tuple) else 0
        c = tid
        tree.weight[c] = tree.weight.get(c, 0) + w
        if with_mapq:
            mapq[c] = mapq.get(c, 0) + q
        while True:
            p = tax.p_tid(c)
            if p < 1 or p == MAX_U32:
                break
            tree.weight[p] = tree.weight.get(p, 0) + w
            if with_mapq:
                mapq[p] = mapq.get(p, 0) + q
            tree.add_child(p, c)
            c = p
    return tree, mapq


def ana_meta_report_from_rsts(rsts, tax: Taxonomy, label: str,
                              print_list: bool = False) -> str:
    """`analysis ana_meta_rst` path (ana_meta, analysis.c:1390-1519)."""
    out = io.StringIO()
    out.write(f"Current read {label}\t{label}\t")
    node_count: dict[int, int] = {}
    total = 0
    i = 0
    while i < len(rsts):
        total += 1
        tid, i = ana_get_tid_stream(rsts, i, tax, flavor="cli")
        if tid > 0:
            node_count[tid] = node_count.get(tid, 0) + 1
    tree, _ = _build_tree(node_count, tax, SZ_COUNT_SORT)
    out.write("Data:\n")
    _print_tree(out, tax, tree, total, print_list, is_base=False)
    out.write(f"total_read_number :{total}\t")
    return out.getvalue()


MIN_BASE_SCORE = 10  # MIN_SCORE (analysis.c:1536)
SZ_BASE_SORT = 16    # BASE_SORT (analysis.c:1521-1524)
SZ_BASE_Q = 24       # NODE_BASE_Q (analysis.c:1676-1680)


def ana_meta_base_report_from_rsts(rsts, tax: Taxonomy, label: str,
                                   m2: bool = False,
                                   print_list: bool = False) -> str:
    """ana_meta_base (analysis.c:1537-1674) / ana_meta_base_M2
    (analysis.c:1684-1803): base-weighted abundance with a min-score gate,
    low-identity stats, and (M2) length-weighted mapQ aggregation."""
    out = io.StringIO()
    out.write(f"Current read {label}\t{label}\t")
    node_base: dict[int, tuple[int, int]] = {}
    total_base = 0
    low_n = low_b = 0
    i = 0
    while i < len(rsts):
        rst = rsts[i]
        read_len = rst.read_length
        map_q = rst.mapq
        coverage = 0.0
        if rst.is_classify == "C" and rst.tid <= tax.max_tid:
            coverage = (
                f32(np.float32(rst.score) / np.float32(read_len))
                if read_len > 0 else 0.0
            )
        tid, i = ana_get_tid_stream(rsts, i, tax, flavor="cli")
        if tid > 0:
            if f32(np.float32(coverage) * np.float32(read_len)) > MIN_BASE_SCORE:
                total_base += read_len
                b, q = node_base.get(tid, (0, 0))
                node_base[tid] = (b + read_len, q + read_len * map_q)
                if coverage < 0.08:
                    low_b += read_len
                    low_n += 1
    tree, mapq = _build_tree(node_base, tax,
                             SZ_BASE_Q if m2 else SZ_BASE_SORT,
                             with_mapq=m2)
    out.write("Analysis based on base number:\n")
    _print_tree(out, tax, tree, total_base, print_list, is_base=m2, mapq=mapq)
    out.write(f"total_mapped_base_number :{total_base}\n")
    out.write(f"low identity read (identity <= 75%) number :{low_n}\t")
    out.write(f"total base {low_b}\t")
    return out.getvalue()


# ------------------------------------------------------- .so meta path ----
def species_type_of(tid: int, tax: Taxonomy) -> str:
    """Leaf classification (ana_meta_loop_fprint, cly_mt.c:869-892)."""
    if tid in (0, 1):
        return "no_match"
    n = tid
    while n != MAX_U32:
        if n == 9606:
            return "human"
        if n in ANIMAL_PLANT_TIDS:
            return "animal_and_plant"
        n = tax.p_tid(n)
    return "microbe"


def meta_analysis(sam_text: str, tax: Taxonomy, flag: int,
                  max_snapshot_len: int):
    """The .so meta_analysis (cly_mt.c:1083-1235 + 1329-1413).

    Returns (report_text, human_snapshot or None)."""
    rsts = list(iter_sam(sam_text, "engine"))
    if not rsts:
        return "", None
    human_parts = []
    for r in rsts:
        if r.seq and r.seq[0] != "*" and r.tid in HUMAN_TIDS:
            human_parts.append(r.seq)
    node_count: dict[int, int] = {}
    total_weight = 0
    i = 0
    while i < len(rsts):
        weight = 1 if (flag & 0x1) == 0 else rsts[i].read_length
        total_weight += weight
        tid, i = ana_get_tid_stream(rsts, i, tax)
        node_count[tid] = node_count.get(tid, 0) + weight
    # tree build (cly_mt.c:1192-1222): weights added along the whole path
    tree = WeightTree()
    for tid, cnt in _sorted_counts(node_count):
        c = tid
        while True:
            p = tax.p_tid(c)
            tree.weight[c] = tree.weight.get(c, 0) + cnt
            if p == MAX_U32:
                break
            tree.add_child(p, c)
            c = p

    lines = []

    def rec(node_id, total):
        w = tree.weight.get(node_id, 0)
        if w == 0:
            return
        rate = f32(f32(w) / total) if total else 0.0
        kids = tree.children.get(node_id, [])
        if kids:
            for ch in kids:
                rec(ch, total)
        else:
            st = species_type_of(node_id, tax)
            lines.append(
                f"{st}\t{tax.name[node_id]}|{tax.rank[node_id]}\tnull\t{_fmt_f(rate)}\n"
            )

    rec(0, total_weight)
    rec(1, total_weight)

    human = "".join(human_parts)
    snapshot = human[:max_snapshot_len] if human else None

    # post-processing (cly_mt.c:1343-1411)
    no_match_rate = 0.0
    results = []
    for ln in lines:
        t, sp, tech, rate = ln.rstrip("\n").split("\t")
        if t == "no_match":
            no_match_rate = f32(no_match_rate + float(rate))
        else:
            results.append([t, sp, tech, float(rate)])
    if no_match_rate > 0.95:
        return "no_match\tnull|null\tnull\t0\n", snapshot
    for r in results:
        r[3] = f32(r[3] / f32(1.0 - no_match_rate))
    perm = qsort_perm(
        len(results), 772,  # sizeof(MetaRST): 3*256 + 4
        lambda a, b: -1 if results[a][3] > results[b][3]
        else (1 if results[a][3] < results[b][3] else 0),
    )
    results = [results[k] for k in perm]
    out = []
    for i, r in enumerate(results):
        if i < 3 or (r[0] == "human" and r[3] > 0.05):
            out.append(f"{r[0]}\t{r[1]}\t{r[2]}\t{_fmt_f(r[3])}\n")
    return "".join(out), snapshot
