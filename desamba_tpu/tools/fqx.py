"""fqx: extract ACGT runs from arbitrary bytes into FASTQ records.

Equivalent of the reference's tools/fqx.c:7-68: scan the input byte
stream; every maximal run of [ACGTacgt] with length >= threshold becomes
one FASTQ record named by a running integer id, quality all 'I'; shorter
runs are dropped. Output is gzip-compressed (the C writes via gzopen).
"""
from __future__ import annotations

import gzip
import re

_RUN = re.compile(rb"[ACGTacgt]+")


def fqx(input_path: str, output_path: str, threshold: int = 10) -> int:
    """Returns the number of records written."""
    with open(input_path, "rb") as f:
        data = f.read()
    rec_id = 0
    # the reference always writes via gzopen (fqx.c:10) -> always gzip
    with gzip.open(output_path, "wb") as out:
        for m in _RUN.finditer(data):
            run = m.group(0)
            if len(run) < threshold:
                continue
            out.write(b"@%d\n%s\n+\n%s\n" % (rec_id, run, b"I" * len(run)))
            rec_id += 1
    return rec_id


def random_text(n_bytes: int, seed: int = 0) -> bytes:
    """tools/random_text.py equivalent: printable random bytes for fqx
    input in tests."""
    import numpy as np

    rng = np.random.default_rng(seed)
    return rng.integers(32, 127, n_bytes, dtype=np.uint8).tobytes()


def main(argv):
    import argparse

    ap = argparse.ArgumentParser(prog="desamba-tpu fqx")
    ap.add_argument("input")
    ap.add_argument("output")
    ap.add_argument("-l", type=int, default=10, help="min run length")
    a = ap.parse_args(argv)
    n = fqx(a.input, a.output, a.l)
    print(f"{n} records")
    return 0
