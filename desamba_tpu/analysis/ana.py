"""Rank-level accuracy evaluation (ana_tax*, analysis.c:1073-1234).

Given classification output and a single ground-truth tid, reports
sensitivity/accuracy at a taxonomic rank, with the reference's exact
per-read detail prints (stdout) and stat line (stderr).
"""
from __future__ import annotations

import sys

from ..io.taxonomy import MAX_U32, Taxonomy, load_taxonomy_cli
from .meta import Rst, f32, iter_sam


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
                 out=None, err=None) -> dict:
    """ana_tax (analysis.c:1073-1234). Returns the stats dict."""
    out = out or sys.stdout
    err = err or sys.stderr
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
    err.write(f"{f32(f32(unmapped) / total * 100):f}%\t")
    err.write(f"{f32(f32(right_first) / total * 100):f}%\t")
    err.write(
        f"{f32(f32(right_first) / (total - unmapped) * 100):f}%\t"
        if total != unmapped else "nan%\t"
    )
    err.write(f"{f32(f32(right_second + right_first) / total * 100):f}%\t")
    denom = total - unmapped
    err.write(
        f"{f32(f32(right_second + right_first) / denom * 100):f}%\t\n"
        if denom else "nan%\t\n"
    )
    return dict(
        total=total, unmapped=unmapped, right_primary=right_first,
        right_all=right_first + right_second, wrong=wrong,
    )


def ana_tax_sam(sam_path: str, right_tax: int, nodes_path: str, rank: str) -> int:
    tax = load_taxonomy_cli(nodes_path)
    rsts = list(iter_sam(open(sam_path).read(), "cli"))
    ana_tax_rsts(rsts, right_tax, tax, rank)
    return 0
