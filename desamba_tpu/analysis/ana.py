"""Rank-level accuracy evaluation (ana_tax*, analysis.c:1073-1234).

Given classification output and a single ground-truth tid, reports
sensitivity/accuracy at a taxonomic rank, with the reference's exact
per-read detail prints (stdout) and stat line (stderr).
"""
from __future__ import annotations

import sys

from ..io.taxonomy import MAX_U32, Taxonomy, load_taxonomy_cli
from .meta import Rst, _fmt_f, f32, fdiv, fmul, iter_sam


def _pct(a, b) -> str:
    """C `(float)a/b*100` printed as %f%% (nan/inf like glibc)."""
    return _fmt_f(fmul(fdiv(a, b), 100)) + "%"


def get_tax_by_rank(tax: Taxonomy, tid: int, rank: str) -> int:
    """analysis.c:1029-1047: ascend until the rank matches; 0 if none."""
    c = tid
    while True:
        if tax.rank[c] == rank:
            return c
        c = tax.p_tid(c)
        if c <= 1 or c == MAX_U32:
            return 0


def compare_tax(tax: Taxonomy, tax_a: int, tax_b: int) -> bool:
    """analysis.c:1051-1065: is tax_a an ancestor (or self) of tax_b."""
    c = tax_b
    while True:
        if c == tax_a:
            return True
        c = tax.p_tid(c)
        if c <= 1 or c == MAX_U32:
            return False


def ana_tax_rsts(rsts: list[Rst], right_tax: int, tax: Taxonomy, rank: str,
                 out=None, err=None, label: str | None = None) -> dict:
    """ana_tax (analysis.c:1073-1234). Returns the stats dict."""
    out = out or sys.stdout
    err = err or sys.stderr
    if label is not None:
        err.write(f"{label}\t")
    no_rank = rank == "null"
    total = unmapped = right_first = right_second = wrong = 0
    i = 0
    n = len(rsts)
    while i < n:
        rst = rsts[i]
        total += 1
        out.write(f"\n{rst.read_name} ")
        if rst.is_classify == "U":
            unmapped += 1
            out.write("UM")
            i += 1
            if i >= n:
                break
            continue

        def right_of(tid):
            if no_rank:
                return compare_tax(tax, right_tax, tid)
            return right_tax == get_tax_by_rank(tax, tid, rank)

        right = right_of(rst.tid)
        if right:
            right_first += 1
            out.write("PRI")
        name = rst.read_name
        i += 1
        eof = False
        while True:
            if i >= n:
                eof = True
                break
            nxt = rsts[i]
            if nxt.read_name == name:
                if not right and right_of(nxt.tid):
                    right = True
                    right_second += 1
                    out.write("SEC")
                i += 1
            else:
                break
        if eof:
            break
        if not right:
            wrong += 1
    err.write(f"{total}\t{unmapped}\t{right_first}\t{right_second + right_first}\t")
    err.write(f"{_pct(unmapped, total)}\t")
    err.write(f"{_pct(right_first, total)}\t")
    err.write(f"{_pct(right_first, total - unmapped)}\t")
    err.write(f"{_pct(right_second + right_first, total)}\t")
    err.write(f"{_pct(right_second + right_first, total - unmapped)}\n")
    return dict(
        total=total, unmapped=unmapped, right_primary=right_first,
        right_all=right_first + right_second, wrong=wrong,
    )


def ana_tax_sam(sam_path: str, right_tax: int, nodes_path: str, rank: str) -> int:
    tax = load_taxonomy_cli(nodes_path)
    rsts = list(iter_sam(open(sam_path).read(), "cli"))
    ana_tax_rsts(rsts, right_tax, tax, rank)
    return 0


class _FilterFile:
    """get_filter_result (analysis.c:2173-2201): sequential name lookup in a
    `name P|F` file with a single rewind allowed before aborting."""

    def __init__(self, path: str):
        self.lines = open(path).read().splitlines()
        self.pos = 0

    def get(self, read_name: str) -> str:
        reset = False
        while True:
            if self.pos >= len(self.lines):
                sys.stderr.write("With out filter info! file reset")
                self.pos = 0
                if reset:
                    raise RuntimeError("With out filter info!")
                reset = True
                if not self.lines:
                    raise RuntimeError("Filter info file no data!")
            line = self.lines[self.pos]
            self.pos += 1
            sp = line.find(" ")
            name = line[:sp] if sp >= 0 else line
            if name == read_name:
                return line[sp + 1] if 0 <= sp < len(line) - 1 else "F"


def ana_tax_with_filter(rsts: list[Rst], right_tax: int, tax: Taxonomy,
                        rank: str, filter_path: str, out=None, err=None,
                        label: str | None = None):
    """ana_tax_with_filter (analysis.c:2203-2360): rank accuracy counting
    only reads the filter file marks 'P' (detail prints unconditional)."""
    out = out or sys.stdout
    err = err or sys.stderr
    if label is not None:
        err.write(f"{label}\t")
    filt_file = _FilterFile(filter_path)
    total = unmapped = rf = rs = wrong = 0
    n = len(rsts)
    if n == 0:
        return
    i = 0
    while True:
        rst = rsts[i]
        filt = filt_file.get(rst.read_name)
        if filt == "P":
            total += 1
        out.write(f"\n{rst.read_name} ")
        if rst.is_classify == "U":
            if filt == "P":
                unmapped += 1
            out.write("UM")
            i += 1
            if i >= n:
                break
            continue
        right = right_tax == get_tax_by_rank(tax, rst.tid, rank)
        if right:
            if filt == "P":
                rf += 1
            out.write("PRI")
        name = rst.read_name
        i += 1
        eof = False
        while True:
            if i >= n:
                eof = True
                break
            nxt = rsts[i]
            if nxt.read_name == name:
                if not right and right_tax == get_tax_by_rank(tax, nxt.tid, rank):
                    right = True
                    if filt == "P":
                        rs += 1
                    out.write("SEC")
                i += 1
            else:
                break
        if eof:
            break
        if not right and filt == "P":
            wrong += 1
    err.write(f"{total}\t{unmapped}\t{rf}\t{rs + rf}\t")
    err.write(f"{_pct(unmapped, total)}\t")
    err.write(f"{_pct(rf, total)}\t")
    err.write(f"{_pct(rf, total - unmapped)}\t")
    err.write(f"{_pct(rs + rf, total)}\t")
    err.write(f"{_pct(rs + rf, total - unmapped)}\n")
