"""K-mer set extraction and the `kmer.srt` interchange format.

`kmer.srt` (written by `deSAMBA kmersort`, idx_sort.c:196-200) is simply
``u64 count`` followed by ``count`` sorted uint64 packed k-mers. The
reference obtains the k-mer set from a Jellyfish dump; we extract it
directly from the FASTA (forward strand, ACGT runs only — Jellyfish is run
without -C, build-index:88). A Jellyfish binary-dump reader is provided for
interop (format per jreader_open, idx_sort.c:30-48).
"""
from __future__ import annotations

import struct

import numpy as np

from ..constants import B_KMER
from ..io.fastx import read_fastx
from ..utils import codec


def extract_kmers(ref_path_or_records, k: int = B_KMER) -> np.ndarray:
    """Distinct sorted forward k-mers from all ACGT runs >= k."""
    if isinstance(ref_path_or_records, (str, bytes)) or hasattr(
        ref_path_or_records, "__fspath__"
    ):
        records = read_fastx(ref_path_or_records)
    else:
        records = ref_path_or_records
    chunks = []
    for r in records:
        codes = codec.seq_to_codes(r.seq, codec.BIT)
        for s, e in codec.acgt_runs(codes):
            if e - s >= k:
                chunks.append(codec.rolling_kmers(codes[s:e], k))
    if not chunks:
        return np.empty(0, dtype=np.uint64)
    return np.unique(np.concatenate(chunks))


def write_kmer_srt(path: str, kmers: np.ndarray) -> None:
    with open(path, "wb") as f:
        f.write(struct.pack("<Q", kmers.size))
        f.write(np.asarray(kmers, dtype="<u8").tobytes())


def read_kmer_srt(path: str) -> np.ndarray:
    with open(path, "rb") as f:
        (n,) = struct.unpack("<Q", f.read(8))
        return np.frombuffer(f.read(n * 8), dtype="<u8")


def read_jellyfish_dump(path: str) -> np.ndarray:
    """Read a Jellyfish 1.x binary dump ("JFLISTDN", idx_sort.c:30-48).

    Returns the raw (unsorted, possibly duplicated) packed k-mers.
    """
    with open(path, "rb") as f:
        magic = f.read(8)
        if magic != b"JFLISTDN":
            raise ValueError("not a Jellyfish binary dump")
        (key_bits,) = struct.unpack("<Q", f.read(8))
        (val_len,) = struct.unpack("<Q", f.read(8))
        if val_len != 4:
            raise ValueError("can only handle 4 byte DB values")
        f.seek(48)
        (key_ct,) = struct.unpack("<Q", f.read(8))
        key_len = key_bits // 8 + (1 if key_bits % 8 else 0)
        h_size = 72 + 2 * (4 + 8 * key_bits)
        f.seek(h_size)
        pair = key_len + val_len
        raw = np.frombuffer(f.read(pair * key_ct), dtype=np.uint8)
        raw = raw.reshape(key_ct, pair)[:, :key_len]
        out = np.zeros(key_ct, dtype=np.uint64)
        for i in range(key_len):
            out |= raw[:, i].astype(np.uint64) << np.uint64(8 * i)
        return out
