"""Regenerate tests/golden/* from the compiled reference binary.

Run from the repo root with the reference binary available:
    python tests/make_goldens.py

Produces a deterministic demo set (mosaic genomes + diverse reads), filters
out reads that crash the reference (its own bugs: sdp_left_M2 uint32
underflow wild-read, sdp_middle_M2 2000bp assert — see DESIGN.md), then
records the reference's classify SAM and ana_meta output as goldens.
"""
from __future__ import annotations

import os
import subprocess
import sys

sys.path[:0] = [
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    os.path.dirname(os.path.abspath(__file__)),
]
import numpy as np  # noqa: E402
from testdata import make_references, make_taxonomy, mutate_read  # noqa: E402

from desamba_tpu.index.kmers import extract_kmers, write_kmer_srt  # noqa: E402
from desamba_tpu.io.fastx import write_fasta, write_fastq  # noqa: E402

REF_BIN = os.environ.get("DESAMBA_REF_BIN", "/tmp/refbuild/bin/deSAMBA")
GOLD = os.path.join(os.path.dirname(os.path.abspath(__file__)), "golden")


def diverse_reads(refs, seed=99):
    rng = np.random.default_rng(seed)
    code = np.full(256, 0, np.uint8)
    for j, b in enumerate(b"ACGT"):
        code[b] = j
    BASES = np.frombuffer(b"ACGT", dtype=np.uint8)
    reads = []

    def add(name, seq):
        reads.append((name, seq, b"I" * len(seq)))

    def frag_read(name, lo, hi, err, maybe_rc=True):
        gi = int(rng.integers(len(refs)))
        n, g = refs[gi]
        tid = n.split("|")[1]
        L = int(rng.integers(lo, hi))
        st = int(rng.integers(0, len(g) - L))
        fr = code[np.frombuffer(g[st : st + L], np.uint8)]
        if maybe_rc and rng.integers(2):
            fr = (3 - fr)[::-1]
        add(f"{name}_{tid}", mutate_read(rng, fr, err))

    for i in range(25):
        frag_read(f"ngs.{i}", 90, 200, 0.01)
    for i in range(20):
        frag_read(f"s3g.{i}", 520, 1200, 0.12)
    for i in range(10):
        frag_read(f"mid.{i}", 120, 300, 0.08, maybe_rc=False)
    for i in range(15):
        frag_read(f"l3g.{i}", 1000, 2800, 0.18)
    add("tiny.0", b"ACGTACGT")
    add("nn.0", refs[0][1][100:400] + b"N" * 30 + refs[1][1][500:900])
    add("random.0", BASES[rng.integers(0, 4, 800)].tobytes())
    add("polyA.0", b"A" * 500)
    return reads


def main():
    os.makedirs(GOLD, exist_ok=True)
    refs = make_references(seed=7, n_genomes=3, length=30000)
    write_fasta(os.path.join(GOLD, "ref.fa"), refs)
    nodes, names = make_taxonomy()
    open(os.path.join(GOLD, "nodes.dmp"), "w").write(nodes)
    open(os.path.join(GOLD, "names.dmp"), "w").write(names)

    srt = "/tmp/golden_kmer.srt"
    write_kmer_srt(srt, extract_kmers(os.path.join(GOLD, "ref.fa")))
    idx_dir = "/tmp/golden_idx"
    subprocess.run(
        [REF_BIN, "index", srt, os.path.join(GOLD, "ref.fa"), idx_dir],
        check=True, capture_output=True,
    )

    reads = diverse_reads(refs)
    keep = []
    for r in reads:
        write_fastq("/tmp/golden_one.fq", [r])
        p = subprocess.run(
            [REF_BIN, "classify", "-t", "1", idx_dir, "/tmp/golden_one.fq"],
            capture_output=True,
        )
        if p.returncode == 0:
            keep.append(r)
        else:
            print(f"excluding crash read {r[0]} (reference bug)")
    write_fastq(os.path.join(GOLD, "reads.fq"), keep)

    p = subprocess.run(
        [REF_BIN, "classify", "-t", "1", idx_dir, os.path.join(GOLD, "reads.fq")],
        check=True, capture_output=True,
    )
    open(os.path.join(GOLD, "classify.sam"), "wb").write(p.stdout)
    # SAM_FULL variant (used by the .so path and meta_analysis input)
    p = subprocess.run(
        [REF_BIN, "classify", "-t", "1", "-f", "SAM_FULL", idx_dir,
         os.path.join(GOLD, "reads.fq")],
        check=True, capture_output=True,
    )
    open(os.path.join(GOLD, "classify_full.sam"), "wb").write(p.stdout)
    # ana_meta report (CLI analysis path)
    p = subprocess.run(
        [REF_BIN, "analysis", "ana_meta", os.path.join(GOLD, "classify.sam"),
         os.path.join(GOLD, "nodes.dmp")],
        check=True, capture_output=True,
    )
    open(os.path.join(GOLD, "ana_meta.txt"), "wb").write(p.stdout)
    print("goldens written to", GOLD)


if __name__ == "__main__":
    main()
