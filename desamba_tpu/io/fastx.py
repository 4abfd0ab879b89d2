"""FASTA/FASTQ streaming reader (gzip-aware).

Functional equivalent of the klib kseq parser (lib/utils.c:918-999,
lib/utils.h:278-281): name = chars up to first whitespace, sequence may span
lines, '+' section of FASTQ skipped, qualities concatenated to sequence
length. Accepts plain or gzip files and in-memory bytes.
"""
from __future__ import annotations

import gzip
import io
from dataclasses import dataclass
from typing import Iterable, Iterator


@dataclass
class SeqRecord:
    name: str
    comment: str
    seq: bytes
    qual: bytes | None  # None for FASTA

    def __len__(self) -> int:
        return len(self.seq)


def _open_any(src) -> io.BufferedReader:
    if isinstance(src, (bytes, bytearray)):
        raw = bytes(src)
        if raw[:2] == b"\x1f\x8b":
            return gzip.open(io.BytesIO(raw), "rb")
        return io.BufferedReader(io.BytesIO(raw))
    if hasattr(src, "read"):
        return src
    # path
    f = open(src, "rb")
    magic = f.read(2)
    f.seek(0)
    if magic == b"\x1f\x8b":
        f.close()
        return gzip.open(src, "rb")
    return f


def read_fastx(src) -> Iterator[SeqRecord]:
    """Yield records from a FASTA/FASTQ path, file object, or bytes."""
    fh = _open_any(src)
    try:
        line = fh.readline()
        while line:
            line = line.rstrip(b"\r\n")
            if not line:
                line = fh.readline()
                continue
            if line[:1] not in (b">", b"@"):
                raise ValueError(f"malformed fastx header: {line[:40]!r}")
            is_fastq = line[:1] == b"@"
            head = line[1:]
            sp = head.split(None, 1)
            name = sp[0].decode() if sp else ""
            comment = sp[1].decode() if len(sp) > 1 else ""
            seq_parts: list[bytes] = []
            qual: bytes | None = None
            line = fh.readline()
            if is_fastq:
                while line and line[:1] != b"+":
                    seq_parts.append(line.strip())
                    line = fh.readline()
                seq = b"".join(seq_parts)
                # qualities: read until length matches seq
                qparts: list[bytes] = []
                qlen = 0
                line = fh.readline()
                while line and qlen < len(seq):
                    q = line.strip()
                    qparts.append(q)
                    qlen += len(q)
                    line = fh.readline()
                qual = b"".join(qparts)
                yield SeqRecord(name, comment, seq, qual)
            else:
                while line and line[:1] not in (b">", b"@"):
                    seq_parts.append(line.strip())
                    line = fh.readline()
                yield SeqRecord(name, comment, b"".join(seq_parts), None)
    finally:
        fh.close()


def write_fasta(path, records: Iterable[tuple[str, bytes]], width: int = 80) -> None:
    with open(path, "wb") as f:
        for name, seq in records:
            f.write(b">" + name.encode() + b"\n")
            for i in range(0, len(seq), width):
                f.write(seq[i : i + width] + b"\n")


def write_fastq(path, records: Iterable[tuple[str, bytes, bytes]]) -> None:
    with open(path, "wb") as f:
        for name, seq, qual in records:
            f.write(b"@" + name.encode() + b"\n" + seq + b"\n+\n" + qual + b"\n")
