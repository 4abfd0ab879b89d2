"""2-bit sequence codecs (vectorized NumPy).

Reproduces the reference's three char->code tables and its packing
conventions:
  * ``Bit``      — A/C/G/T -> 0..3, everything else 4   (idx.c:9-27)
  * ``bin_Bit``  — unknown chars treated as 'A' (0)     (idx.c:29-47)
  * ``CLY_Bit``  — unknown chars treated as 'C' (1)     (cly.c:16-34)
  * 2-bit reference packing: first base in the top 2 bits of each byte
    (idx.c:594-603); unpacking mirrors get_ref (cly.c:434-461).
"""
from __future__ import annotations

import numpy as np


def _make_table(default: int) -> np.ndarray:
    t = np.full(256, default, dtype=np.uint8)
    for ch, code in (("A", 0), ("C", 1), ("G", 2), ("T", 3)):
        t[ord(ch)] = code
        t[ord(ch.lower())] = code
    return t


BIT = _make_table(4)
BIN_BIT = _make_table(0)
CLY_BIT = _make_table(1)

# BWT char set 'A','C','G','T','#','$' -> 0..5 (idx.c:49)
CHARS = np.frombuffer(b"ACGT#$", dtype=np.uint8)


def seq_to_codes(seq: bytes | np.ndarray, table: np.ndarray = BIT) -> np.ndarray:
    """Map an ASCII sequence to codes via one of the tables above."""
    if isinstance(seq, (bytes, bytearray, memoryview)):
        arr = np.frombuffer(seq, dtype=np.uint8)
    else:
        arr = np.asarray(seq, dtype=np.uint8)
    return table[arr]


def acgt_runs(codes: np.ndarray) -> list[tuple[int, int]]:
    """Maximal [start, end) runs where codes != 4 (valid ACGT stretches)."""
    valid = codes != 4
    if valid.size == 0:
        return []
    d = np.diff(valid.astype(np.int8))
    starts = list(np.nonzero(d == 1)[0] + 1)
    ends = list(np.nonzero(d == -1)[0] + 1)
    if valid[0]:
        starts.insert(0, 0)
    if valid[-1]:
        ends.append(valid.size)
    return list(zip(starts, ends))


def rolling_kmers(codes2: np.ndarray, k: int) -> np.ndarray:
    """All k-mers of a 2-bit code array as uint64, big-endian base order.

    codes2 must contain only values 0..3. Matches char2Kmer
    (lib/utils.c:1020-1026): first base in the most significant position.
    """
    n = codes2.size - k + 1
    if n <= 0:
        return np.empty(0, dtype=np.uint64)
    c = codes2.astype(np.uint64)
    # sliding window via cumulative shifts: value[i] = sum c[i+j] << 2(k-1-j)
    out = np.zeros(n, dtype=np.uint64)
    for j in range(k):
        out |= c[j : j + n] << np.uint64(2 * (k - 1 - j))
    return out


def kmer_to_string(kmer: int, k: int) -> str:
    return "".join("ACGT"[(int(kmer) >> (2 * (k - 1 - i))) & 3] for i in range(k))


def revcomp_codes(codes2: np.ndarray) -> np.ndarray:
    """Reverse complement of a 2-bit code array (3 - c reversed)."""
    return (3 - codes2[::-1]).astype(codes2.dtype)


def pack_2bit(codes2: np.ndarray) -> np.ndarray:
    """Pack codes 0..3 into bytes, first base in bits 7..6 (idx.c:594-603)."""
    n = codes2.size
    padded = np.zeros(((n + 3) // 4) * 4, dtype=np.uint8)
    padded[:n] = codes2
    padded = padded.reshape(-1, 4)
    return (
        (padded[:, 0] << 6) | (padded[:, 1] << 4) | (padded[:, 2] << 2) | padded[:, 3]
    ).astype(np.uint8)


def unpack_2bit(packed: np.ndarray, offset: int, length: int, forward: bool = True) -> np.ndarray:
    """Extract ``length`` bases from a packed 2-bit array.

    forward: bases at offset, offset+1, ... (get_ref isForward, cly.c:444-451)
    reverse: bases at offset, offset-1, ... (cly.c:453-460)
    """
    if length <= 0:
        return np.empty(0, dtype=np.uint8)
    if forward:
        idx = offset + np.arange(length, dtype=np.int64)
    else:
        idx = offset - np.arange(length, dtype=np.int64)
    byte = packed[idx >> 2]
    shift = (6 - ((idx & 3) << 1)).astype(np.uint8)
    return ((byte >> shift) & 3).astype(np.uint8)


def unpack_2bit_all(packed: np.ndarray, total: int) -> np.ndarray:
    """Unpack a whole 2-bit array into one byte per base."""
    b = np.asarray(packed, dtype=np.uint8)
    out = np.empty(b.size * 4, dtype=np.uint8)
    out[0::4] = (b >> 6) & 3
    out[1::4] = (b >> 4) & 3
    out[2::4] = (b >> 2) & 3
    out[3::4] = b & 3
    return out[:total]
