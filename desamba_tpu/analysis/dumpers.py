"""Cross-tool result parsers/dumpers to the common RST format.

The reference evaluation suite converts every tool's output (deSAMBA/minimap2
SAM, minimap2 PAF, centrifuge, kaiju, metamaps, BLASTN) into RST lines
(`name\\tC|U\\ttid\\tlen\\tmapq[\\tscore]`) before analysis
(analysis.c:430-960, 2088-2171). The parsers here reproduce the reference's
exact strtok walks — including their quirks (odd delimiters, unset fields) —
via a C-strtok emulator, so dumped RST files are byte-identical.
"""
from __future__ import annotations

import sys

from .meta import Rst


class CTok:
    """glibc strtok over one line: skips leading delimiters, token runs to
    the next delimiter, subsequent calls resume after it."""

    def __init__(self, s: str):
        self.s = s
        self.i = 0

    def tok(self, delims: str) -> str | None:
        s, i, n = self.s, self.i, len(self.s)
        while i < n and s[i] in delims:
            i += 1
        if i >= n:
            self.i = n
            return None
        j = i
        while j < n and s[j] not in delims:
            j += 1
        self.i = j + 1 if j < n else j
        return s[i:j]


def _strtoul(s: str | None) -> int:
    """C strtoul(s, 0, 10): leading spaces + optional sign + digits."""
    if not s:
        return 0
    i, n = 0, len(s)
    while i < n and s[i] in " \t":
        i += 1
    sign = 1
    if i < n and s[i] in "+-":
        sign = -1 if s[i] == "-" else 1
        i += 1
    j = i
    while j < n and s[j].isdigit():
        j += 1
    if i == j:
        return 0
    return (sign * int(s[i:j])) & 0xFFFFFFFF


def _strtof(s: str | None) -> float:
    if not s:
        return 0.0
    import re

    m = re.match(r"\s*[-+]?(\d+(\.\d*)?|\.\d+)([eE][-+]?\d+)?", s)
    return float(m.group(0)) if m else 0.0


# ------------------------------------------------------------------ PAF ----
def parse_paf_line(line: str) -> Rst | None:
    """getOnePAF (analysis.c:601-628): tid from refname field 6, `tid|N|...`."""
    t = CTok(line.rstrip("\n"))
    name = t.tok("\t")
    if name is None:
        return None
    for _ in range(4):
        t.tok("\t")
    ref = t.tok("\t") or ""
    rt = CTok(ref)
    rt.tok("|")
    tid = _strtoul(rt.tok("|"))
    return Rst(name, "C", tid, 0, 0, 0)


def dump_paf(paf_path: str, out):
    """dump_des_PAF_file (analysis.c:630-663): 5-field RST lines."""
    for line in open(paf_path):
        r = parse_paf_line(line)
        if r is None:
            continue
        out.write(f"{r.read_name}\t{r.is_classify}\t{r.tid}\t{r.read_length}\t{r.mapq}\n")


# ----------------------------------------------------------- centrifuge ----
def parse_cen_line(line: str) -> Rst | None:
    """getOnecenSAM (analysis.c:828-873): tid field 3, read length field 9."""
    t = CTok(line.rstrip("\n"))
    name = t.tok("\t")
    if name is None:
        return None
    t.tok("\t")
    tid = _strtoul(t.tok("\t"))
    if tid == 0:
        return Rst(name, "U", 0, 0, 0, 1)
    for _ in range(5):
        t.tok("\t")
    read_len = _strtoul(t.tok("\t"))
    return Rst(name, "C", tid, read_len, 0, 1)


def dump_cen(cen_path: str, out):
    """dump_CEN_file (analysis.c:875-903): 6-field RST lines."""
    for line in open(cen_path):
        r = parse_cen_line(line)
        if r is None:
            continue
        out.write(
            f"{r.read_name}\t{r.is_classify}\t{r.tid}\t{r.read_length}\t{r.mapq}\t{r.score}\n"
        )


# ---------------------------------------------------------------- kaiju ----
def parse_kai_line(line: str) -> Rst | None:
    """getOnekaiSAM (analysis.c:905-938): C/U flag char, tid in 4th token."""
    line = line.rstrip("\n")
    if len(line) < 1:
        return None
    is_c = line[0]
    t = CTok(line[2:] if len(line) > 2 else "")
    name = t.tok("\t")
    if name is None:
        return None
    tid = 0
    if is_c == "C":
        t.tok("\t")
        t.tok("\t")
        tid = _strtoul(t.tok(","))
    return Rst(name, is_c, tid, 0, 0, 0)


def dump_kai(kai_path: str, out, read_length_list: dict | None = None):
    """dump_KAI_file (analysis.c:940-965) / dump_KAI_file_with_length
    (analysis.c:1965-1990): 5-field RST lines."""
    for line in open(kai_path):
        r = parse_kai_line(line)
        if r is None:
            continue
        rl = r.read_length
        if read_length_list is not None:
            # read_ID = strtol(name + 11) (analysis.c:1980)
            rid = _strtoul(r.read_name[11:]) if len(r.read_name) > 11 else 0
            rl = read_length_list.get(rid, 0)
        out.write(f"{r.read_name}\t{r.is_classify}\t{r.tid}\t{rl}\t{r.mapq}\n")


# -------------------------------------------------------------- metamaps ----
def parse_matemap_line(line: str, exchange: dict) -> Rst | None:
    """getOneMATEMAP (analysis.c:468-524): control chars -> spaces, tid from
    the `...d...|tid|...` token, score = strtof(field 14) * 10000."""
    buf = "".join(" " if ord(c) < 10 else c for c in line)
    t = CTok(buf)
    name = t.tok(" ")
    if name is None:
        return None
    read_len = _strtoul(t.tok(" "))
    for _ in range(3):
        t.tok(" ")
    t.tok("d")
    tid_tok = t.tok("|") or ""
    if tid_tok.startswith("x"):
        tid = exchange.get(_strtoul(tid_tok[1:]), 0)
    else:
        tid = _strtoul(tid_tok)
    for _ in range(8):
        tok = t.tok(" ")
    score = int(_strtof(tok) * 10000) & 0xFFFFFFFF
    return Rst(name, "C", tid, read_len, 0, score)


def load_exchange_file(path: str) -> dict:
    """`x<sub>\\t<species>` pairs (dump_matemaps_file, analysis.c:531-537)."""
    exch = {}
    for line in open(path):
        line = line.strip()
        if not line.startswith("x"):
            continue
        parts = line[1:].split()
        if len(parts) >= 2:
            try:
                exch[int(parts[0])] = int(parts[1])
            except ValueError:
                pass
    return exch


def dump_matemaps(sam_path: str, out, exchange: dict):
    """dump_matemaps_file (analysis.c:528-597): per read keep only the
    best-score records (all ties), emitted when the name changes; the final
    group is never flushed (reference behavior)."""
    old_name = None
    max_records: list[Rst] = []
    max_score = 0
    record_num = 0
    for line in open(sam_path):
        r = parse_matemap_line(line, exchange)
        if r is None:
            break
        if old_name is not None and old_name == r.read_name:
            if max_score < r.score:
                max_records = [r]
                max_score = r.score
            elif max_score == r.score:
                max_records.append(r)
        elif record_num != 0:
            for m in max_records:
                out.write(
                    f"{m.read_name}\t{m.is_classify}\t{m.tid}\t{m.read_length}"
                    f"\t{m.mapq}\t{m.score}\n"
                )
            max_score = 0
            old_name = r.read_name
            max_records = [r]
        else:
            old_name = r.read_name
        record_num += 1


# ----------------------------------------------------------------- BLAST ----
def ana_blastn(path: str, err=None) -> tuple[int, int]:
    """ana_BLASTN (analysis.c:2117-2169): count reads and non-overlapping
    aligned length over BLAST outfmt-6 records."""
    err = err or sys.stderr
    record_num = 0
    total_length = 0
    old_name = ""
    st_l: list[int] = []
    ed_l: list[int] = []
    for line in open(path):
        f = line.split()
        if len(f) < 8:
            continue
        name = f[0]
        try:
            length = int(f[3])
            read_st = int(f[6])
            read_ed = int(f[7])
        except ValueError:
            continue
        if name != old_name:
            st_l = [read_st]
            ed_l = [read_ed]
            total_length += length
            record_num += 1
            old_name = name
        else:
            for i in range(len(st_l)):
                if read_st <= ed_l[i] and read_ed >= st_l[i]:
                    break
            else:
                st_l.append(read_st)
                ed_l.append(read_ed)
                total_length += length
    err.write(f"{path}\t {record_num}\t {total_length}\n")
    return record_num, total_length


# --------------------------------------------------------- deSAMBA SAM ----
def dump_des_sam(sam_path: str, out):
    """dump_des_sam_file (analysis.c:430-464): SAM -> 6-field RST."""
    from .meta import iter_sam

    for r in iter_sam(open(sam_path).read(), "cli"):
        out.write(
            f"{r.read_name}\t{r.is_classify}\t{r.tid}\t{r.read_length}"
            f"\t{r.mapq}\t{r.score}\n"
        )


def read_rst_file(path: str) -> list[Rst]:
    """getOneRST (analysis.c:160-190): tab-split with optional mapq/score."""
    out = []
    for line in open(path):
        t = CTok(line.rstrip("\n"))
        name = t.tok("\t")
        if name is None:
            continue
        is_c = (t.tok("\t") or "U")[0]
        tid = _strtoul(t.tok("\t"))
        rl = _strtoul(t.tok("\t"))
        mq = _strtoul(t.tok("\t"))
        sc = _strtoul(t.tok("\t"))
        out.append(Rst(name, is_c, tid, rl, mq, sc))
    return out
