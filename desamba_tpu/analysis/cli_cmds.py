"""`analysis` subcommand dispatcher (simDataTest, analysis.c:2707-2751).

Implements the abundance reports and the core utilities. Accuracy tools
(ana_tax at a rank) are in .ana; cross-tool format converters cover the
deSAMBA SAM/RST path (the centrifuge/kaiju/metamaps parsers mirror the
same RST contract).
"""
from __future__ import annotations

import sys

from ..io.taxonomy import load_taxonomy_cli
from .meta import ana_meta_report, iter_sam


def _ana_meta(sam_path, nodes_path):
    tax = load_taxonomy_cli(nodes_path)
    sam = open(sam_path).read()
    sys.stdout.write(ana_meta_report(sam, tax, sam_path))
    return 0


def _ana_meta_rst(rst_path, nodes_path):
    from .meta import Rst, ana_meta_report_from_rsts

    tax = load_taxonomy_cli(nodes_path)
    rsts = []
    for line in open(rst_path):
        f = line.rstrip("\n").split("\t")
        if len(f) < 4:
            continue
        rsts.append(
            Rst(f[0], f[1][0], int(f[2]), int(f[3]),
                int(f[4]) if len(f) > 4 else 0,
                int(f[5]) if len(f) > 5 else 0)
        )
    sys.stdout.write(ana_meta_report_from_rsts(rsts, tax, rst_path))
    return 0


def _count_base(fq_path):
    """count_base (analysis.c:2439-2455): total reads and bases."""
    from ..io.fastx import read_fastx

    n, bases = 0, 0
    for r in read_fastx(fq_path):
        n += 1
        bases += len(r.seq)
    print(f"total read number: [{n}], total base count: [{bases}]")
    return 0


def _fastq_to_fasta(fq_path):
    from ..io.fastx import read_fastx

    for r in read_fastx(fq_path):
        sys.stdout.write(f">{r.name}\n{r.seq.decode()}\n")
    return 0


def _split_fastq(fq_path, n_parts, _unused=0):
    from ..io.fastx import read_fastx

    n_parts = int(n_parts)
    outs = [open(f"{fq_path}.part{i}", "w") for i in range(n_parts)]
    for i, r in enumerate(read_fastx(fq_path)):
        q = (r.qual or b"I" * len(r.seq)).decode()
        outs[i % n_parts].write(f"@{r.name}\n{r.seq.decode()}\n+\n{q}\n")
    for o in outs:
        o.close()
    return 0


def _reverse_read(fq_path):
    """reverse_read (analysis.c:2477-2506): reverse-complement every read."""
    from ..io.fastx import read_fastx

    comp = bytes.maketrans(b"ACGTacgt", b"TGCAtgca")
    for r in read_fastx(fq_path):
        rc = r.seq.translate(comp)[::-1]
        q = (r.qual or b"I" * len(r.seq))[::-1].decode()
        sys.stdout.write(f"@{r.name}\n{rc.decode()}\n+\n{q}\n")
    return 0


def _file_cmp(a, b):
    """file_cmp_bin (analysis.c:2362-2382)."""
    da = open(a, "rb").read()
    db = open(b, "rb").read()
    if da == db:
        print("files equal")
        return 0
    n = min(len(da), len(db))
    for i in range(n):
        if da[i] != db[i]:
            print(f"files differ at byte {i}")
            return 1
    print(f"files differ in length: {len(da)} vs {len(db)}")
    return 1


def _ana_tax(sam_path, true_col, nodes_path, rank):
    from .ana import ana_tax_sam

    return ana_tax_sam(sam_path, int(true_col), nodes_path, rank)


def dispatch(sub: str, args: list[str]) -> int:
    table = {
        "ana_meta": lambda: _ana_meta(args[0], args[1]),
        "ana_meta_rst": lambda: _ana_meta_rst(args[0], args[1]),
        "ana_species": lambda: _ana_tax(args[0], args[1], args[2], "species"),
        "ana_genus": lambda: _ana_tax(args[0], args[1], args[2], "genus"),
        "ana_sam": lambda: _ana_tax(args[0], args[1], args[2], args[3]),
        "count_base": lambda: _count_base(args[0]),
        "fastq_to_fasta": lambda: _fastq_to_fasta(args[0]),
        "split_fastq": lambda: _split_fastq(*args),
        "reverse_read": lambda: _reverse_read(args[0]),
        "file_cmp": lambda: _file_cmp(args[0], args[1]),
    }
    fn = table.get(sub)
    if fn is None:
        print(f"command [{sub}] unsupported!", file=sys.stderr)
        return 1
    return fn() or 0
