"""`analysis` subcommand dispatcher (simDataTest, analysis.c:2707-2751).

Full reference command surface: abundance reports (read-count and
base-weighted), cross-tool converters (deSAMBA/minimap2 SAM, PAF,
centrifuge, kaiju, metamaps, BLASTN), rank accuracy with optional read
filters, and the FASTQ/file utilities — with the reference's exact output
formats (including its C printf quirks) so outputs diff clean against the
compiled binary.
"""
from __future__ import annotations

import os
import sys

from ..io.taxonomy import load_taxonomy_cli
from .meta import (
    ana_meta_base_report_from_rsts,
    ana_meta_report_from_rsts,
    iter_sam,
)


class _CommentState:
    """kseq comment staleness (lib/utils.c:939-943): a read without a comment
    leaves the previous read's comment string in the buffer; printf of the
    never-set buffer gives glibc's "(null)"."""

    def __init__(self):
        self.cur = None

    def get(self, c):
        if c:
            self.cur = c
        return self.cur if self.cur is not None else "(null)"


def _qual_str(r):
    return r.qual.decode() if r.qual is not None else "(null)"


# ------------------------------------------------------------- abundance ----
def _dump_to_temp(kind, src_path, extra=None):
    """Dump a tool's output to the reference's `<src>.temp` RST file."""
    from . import dumpers

    tmp = src_path + ".temp"
    with open(tmp, "w") as out:
        if kind == "sam":
            dumpers.dump_des_sam(src_path, out)
        elif kind == "paf":
            dumpers.dump_paf(src_path, out)
        elif kind == "cen":
            dumpers.dump_cen(src_path, out)
        elif kind == "kai":
            dumpers.dump_kai(src_path, out, extra)
        elif kind == "matemaps":
            dumpers.dump_matemaps(src_path, out, extra)
    return tmp


def _read_rsts(path):
    from .dumpers import read_rst_file

    return read_rst_file(path)


def _ana_meta_cmd(kind, src, nodes, mode, print_list, extra=None,
                  keep_temp=False):
    """ana_meta_des & friends (analysis.c:1898-2000): dump -> analyze -> rm."""
    tax = load_taxonomy_cli(nodes)
    tmp = _dump_to_temp(kind, src, extra)
    rsts = _read_rsts(tmp)
    if mode == "count":
        sys.stdout.write(ana_meta_report_from_rsts(rsts, tax, tmp, print_list))
    else:
        sys.stdout.write(
            ana_meta_base_report_from_rsts(rsts, tax, tmp, m2=(mode == "base_m2"),
                                           print_list=print_list)
        )
    if not keep_temp:
        os.remove(tmp)
    return 0


def _ana_meta_rst(rst_path, nodes_path, print_list):
    tax = load_taxonomy_cli(nodes_path)
    sys.stdout.write(
        ana_meta_report_from_rsts(_read_rsts(rst_path), tax, rst_path, print_list)
    )
    return 0


def _load_read_lengths(path):
    """read-ID -> length pairs (ana_meta_kai_base, analysis.c:1993-2001)."""
    d = {}
    for line in open(path):
        parts = line.split()
        if len(parts) >= 2:
            try:
                d[int(parts[0])] = int(parts[1])
            except ValueError:
                pass
    return d


# -------------------------------------------------------------- accuracy ----
def _ana_tax_cmd(kind, src, right_tax, nodes, rank, filter_file=None):
    """ana_tax_des/PAF/CEN/KAI (analysis.c:2014-2076) and the *_filter
    variants (analysis.c:2203-2360)."""
    from .ana import ana_tax_rsts, ana_tax_with_filter

    tmp = _dump_to_temp(kind, src) if kind != "rst" else src
    rsts = _read_rsts(tmp)
    tax = load_taxonomy_cli(nodes)
    if filter_file is None:
        ana_tax_rsts(rsts, int(right_tax), tax, rank, label=tmp)
    else:
        ana_tax_with_filter(rsts, int(right_tax), tax, rank, filter_file,
                            label=tmp)
    if kind != "rst":
        os.remove(tmp)
    return 0


def _mark_sam(sam_path, nodes_path, rank):
    """mark_SAM (analysis.c:2385-2437): prefix each SAM line with its tid
    lifted to the rank; lines truncated at 100 chars."""
    from .ana import get_tax_by_rank

    tax = load_taxonomy_cli(nodes_path)
    sys.stderr.write(f"{sam_path}\t")
    for line in open(sam_path):
        if line.startswith("@"):
            continue
        f = line.split("\t")
        tid = 0
        if len(f) > 2 and not f[2].startswith("*"):
            parts = f[2].split("|")
            if len(parts) > 1 and parts[1].isdigit():
                tid = int(parts[1])
        if tid == 0:
            sys.stdout.write("0\t")
        else:
            sys.stdout.write(f"{get_tax_by_rank(tax, tid, rank)}\t")
        sys.stdout.write(line[:100] + "\n")
    return 0


# -------------------------------------------------------------- utilities ----
def _count_base(fq_path):
    """count_base (analysis.c:2439-2454)."""
    from ..io.fastx import read_fastx

    n, bases = 0, 0
    for r in read_fastx(fq_path):
        n += 1
        bases += len(r.seq)
    import numpy as np

    mbp = float(np.float32(bases) / np.float32(1000000))
    sys.stderr.write(
        f"{fq_path} read number: {n} base number {bases} ( {mbp:f} Mbp)\n"
    )
    return 0


def _get_read_by_name(fq_path, read_name):
    """get_read_by_NAME (analysis.c:2456-2475)."""
    from ..io.fastx import read_fastx

    cs = _CommentState()
    for r in read_fastx(fq_path):
        cmt = cs.get(r.comment)
        if r.name == read_name:
            sys.stdout.write(f"@{r.name} {cmt}\n{r.seq.decode()}\n+\n{_qual_str(r)}\n")
    return 0


def _reverse_read(fq_path):
    """reverse_read (analysis.c:2477-2505): RC of every read to stderr."""
    from ..io.fastx import read_fastx

    import numpy as np

    comp = {65: "T", 67: "G", 71: "C", 84: "A"}
    n = bases = 0
    for r in read_fastx(fq_path):
        n += 1
        bases += len(r.seq)
        sys.stderr.write("".join(comp.get(b, "X") for b in r.seq[::-1]))
        sys.stderr.write("\n\n\n")
    mbp = float(np.float32(bases) / np.float32(1000000))
    sys.stderr.write(
        f"{fq_path} read number: {n} base number {bases} ( {mbp:f} Mbp)\n"
    )
    return 0


def _split_fastq(fq_path, begin, step):
    """split_fastq (analysis.c:2507-2541): emit reads begin, begin+step, ..."""
    from ..io.fastx import read_fastx

    import numpy as np

    begin, step = int(begin), int(step)
    total_length = 0
    read_number = 0
    cs = _CommentState()
    for r in read_fastx(fq_path):
        cmt = cs.get(r.comment)
        if read_number >= begin and (read_number - begin) % step == 0:
            sys.stdout.write(
                f"@{r.name} {cmt}\n{r.seq.decode()}\n+\n{_qual_str(r)}\n"
            )
            total_length += len(r.seq)
        read_number += 1
    mbp = float(np.float32(total_length) / np.float32(1000000))
    sys.stderr.write(
        f"{fq_path} read number: {read_number} base number {total_length} "
        f"( {mbp:f} Mbp)\n"
    )
    return 0


def _cen_map(fa_path):
    """get_centrifuge_map_file (analysis.c:2533-2562): name<TAB-4-spaces>tid."""
    from ..io.fastx import read_fastx

    for r in read_fastx(fa_path):
        name = r.name
        p = name.find("|", 4)
        cut = name if p < 0 else name[:p]
        parts = cut.split("|")
        tid = int(parts[1]) if len(parts) > 1 and parts[1].isdigit() else 0
        sys.stdout.write(f"{cut}    {tid}\n")
    return 0


def _pacbio_filter(fq_path):
    """pacbio_filter (analysis.c:2564-2649): P/F per read; a read fails when
    shorter than 1000 bp or when its non-low-complexity length is < 1000
    (27-mer windows, any base >= 70% of window)."""
    import numpy as np

    from ..io.fastx import read_fastx

    READ_FILTER_MIN_LEN = 1000
    W = 27
    MAXC = int(W * 0.7)
    read_number = filtered = 0
    for r in read_fastx(fq_path):
        read_number += 1
        L = len(r.seq)
        ok = L >= READ_FILTER_MIN_LEN
        if ok:
            s = np.frombuffer(r.seq, dtype=np.uint8)
            n_windows = L - 28  # reference scans i in [0, len-28)
            if n_windows > 0:
                low = np.zeros(n_windows, dtype=bool)
                for bases in ((65, 97), (67, 99), (71, 103), (84, 116)):
                    is_b = (s == bases[0]) | (s == bases[1])
                    c = np.concatenate([[0], np.cumsum(is_b)])
                    cnt = c[W:] - c[:-W]  # count in each 27-window
                    low |= cnt[:n_windows] >= MAXC
                abnormal = int(low.sum())
            else:
                abnormal = 0
            if L - abnormal < READ_FILTER_MIN_LEN:
                ok = False
        if ok:
            sys.stdout.write(f"{r.name} P\n")
        else:
            filtered += 1
            sys.stdout.write(f"{r.name} F\n")
    sys.stderr.write(
        f"file name: {fq_path} total number: {read_number} "
        f"filtered number: {filtered}\n"
    )
    return 0


def _fastq_to_fasta(fq_path):
    """fastq_to_fasta (analysis.c:2651-2663)."""
    from ..io.fastx import read_fastx

    cs = _CommentState()
    for r in read_fastx(fq_path):
        sys.stdout.write(f">{r.name} {cs.get(r.comment)}\n{r.seq.decode()}\n")
    return 0


def _fastq_to_name(fq_path):
    """fastq_to_name (analysis.c:2665-2674)."""
    from ..io.fastx import read_fastx

    cs = _CommentState()
    for r in read_fastx(fq_path):
        sys.stdout.write(f"{r.name} {cs.get(r.comment)}\n")
    return 0


def _file_name(fa_path):
    """file_name (analysis.c:1875-1896): name truncated at the first '|'
    at/after index 4, printed whole and from index 4."""
    from ..io.fastx import read_fastx

    for r in read_fastx(fa_path):
        name = r.name
        p = name.find("|", 4)
        cut = name if p < 0 else name[:p]
        sys.stdout.write(f"{cut}\t{cut[4:]}\n")
    return 0


def _rst_stat(rst_path):
    """rst_stat (analysis.c:1855-1871), including its off-by-one: the first
    record is never counted and the last is counted twice."""
    recs = _read_rsts(rst_path)
    if not recs:
        sys.stderr.write("total:0, U:0,C:0")
        return 0
    counted = recs[1:] + [recs[-1]]
    u = sum(1 for r in counted if r.is_classify == "U")
    c = len(counted) - u
    sys.stderr.write(f"total:{len(recs)}, U:{u},C:{c}")
    return 0


def _ana_univ(unv_path):
    """uni_v_analysis (analysis.c:1820-1852): unitig length histogram."""
    import numpy as np

    with open(unv_path, "rb") as f:
        n = int.from_bytes(f.read(8), "little")
        data = np.frombuffer(f.read(n * 8), dtype="<u4").reshape(-1, 2)
    lengths = data[:, 1]
    NUM = 1000
    over = int(lengths[lengths >= NUM].sum())
    counts = np.bincount(lengths[lengths < NUM], minlength=NUM)
    for i in range(NUM):
        sys.stdout.write(f"{i} {int(counts[i])}\n")
    sys.stdout.write(f"over_{NUM} {over}\n")
    return 0


def _file_cmp(a, b):
    """file_cmp_bin (analysis.c:2362-2382): abort at the first difference."""
    da = open(a, "rb").read()
    db = open(b, "rb").read()
    if da == db:
        return 0
    n = min(len(da), len(db))
    for i in range(n):
        if da[i] != db[i]:
            sys.stderr.write(f"files differ at byte {i}\n")
            return 1
    sys.stderr.write(f"files differ in length: {len(da)} vs {len(db)}\n")
    return 1


def _ana_blastn(path):
    from .dumpers import ana_blastn

    ana_blastn(path)
    return 0


def dispatch(sub: str, args: list[str]) -> int:
    print_list = False
    if args and args[-1] == "print_list":
        print_list = True
        sys.stderr.write("ANA_PRINT_USE_LIST = 1\n")
        args = args[:-1]
    table = {
        "ana_meta": lambda: _ana_meta_cmd("sam", args[0], args[1], "count", print_list),
        "ana_meta_base": lambda: _ana_meta_cmd("sam", args[0], args[1], "base_m2", print_list),
        "ana_meta_cen_base": lambda: _ana_meta_cmd("cen", args[0], args[1], "base", print_list),
        "ana_meta_cen": lambda: _ana_meta_cmd("cen", args[0], args[1], "count", print_list),
        "ana_meta_kai": lambda: _ana_meta_cmd("kai", args[0], args[1], "count", print_list),
        "ana_meta_kai_base": lambda: _ana_meta_cmd(
            "kai", args[0], args[1], "base", print_list,
            extra=_load_read_lengths(args[2])),
        "ana_matemaps_base": lambda: _ana_meta_cmd(
            "matemaps", args[0], args[1], "base", print_list,
            extra=_load_exchange(args[2]), keep_temp=True),
        "ana_meta_rst": lambda: _ana_meta_rst(args[0], args[1], print_list),
        "ana_species": lambda: _ana_tax_cmd("sam", args[0], args[1], args[2], "species"),
        "ana_genus": lambda: _ana_tax_cmd("sam", args[0], args[1], args[2], "genus"),
        "ana_sam": lambda: _ana_tax_cmd("sam", args[0], args[1], args[2], args[3]),
        "ana_paf": lambda: _ana_tax_cmd("paf", args[0], args[1], args[2], args[3]),
        "ana_cen": lambda: _ana_tax_cmd("cen", args[0], args[1], args[2], args[3]),
        "ana_kai": lambda: _ana_tax_cmd("kai", args[0], args[1], args[2], args[3]),
        "ana_BLASTN": lambda: _ana_blastn(args[0]),
        "ana_dump_filter": lambda: _ana_tax_cmd(
            "rst", args[0], args[1], args[2], args[3], filter_file=args[4]),
        "ana_sam_filter": lambda: _ana_tax_cmd(
            "sam", args[0], args[1], args[2], args[3], filter_file=args[4]),
        "ana_paf_filter": lambda: _ana_tax_cmd(
            "paf", args[0], args[1], args[2], args[3], filter_file=args[4]),
        "mark_genus": lambda: _mark_sam(args[0], args[1], "genus"),
        "count_base": lambda: _count_base(args[0]),
        "get_read_by_NAME": lambda: _get_read_by_name(args[0], args[1]),
        "reverse_read": lambda: _reverse_read(args[0]),
        "cen_map": lambda: _cen_map(args[0]),
        "split_fastq": lambda: _split_fastq(args[0], args[1], args[2]),
        "pacbio_filter": lambda: _pacbio_filter(args[0]),
        "fastq_to_fasta": lambda: _fastq_to_fasta(args[0]),
        "fastq_to_name": lambda: _fastq_to_name(args[0]),
        "ana_univ": lambda: _ana_univ(args[0]),
        "rst_stat": lambda: _rst_stat(args[0]),
        "file_name": lambda: _file_name(args[0]),
        "file_cmp": lambda: _file_cmp(args[0], args[1]),
    }
    fn = table.get(sub)
    if fn is None:
        sys.stderr.write(f"command [{sub}] unsupported!\n\n")
        return 1
    return fn() or 0


def _load_exchange(path):
    from .dumpers import load_exchange_file

    return load_exchange_file(path)
