"""Benchmark: reads/sec/chip for batched long-read classification.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline compares against the reference C binary (single thread, its
PR1 config) measured live on this host when available, else against the
recorded host-CPU figure in /tmp-cache or BENCH_BASELINE_RPS.

Extra diagnostics go to stderr only.
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "tests"))

CACHE = "/tmp/desamba_tpu_bench"
REF_BIN = os.environ.get("DESAMBA_REF_BIN", "/tmp/refbuild/bin/deSAMBA")
N_READS = int(os.environ.get("BENCH_READS", "256"))
FALLBACK_BASELINE_RPS = float(os.environ.get("BENCH_BASELINE_RPS", "185.0"))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def prepare():
    import numpy as np

    from desamba_tpu.index.build import build_index
    from desamba_tpu.index.format_ref import save_ref_format
    from desamba_tpu.io.fastx import write_fasta, write_fastq
    from testdata import make_references, make_reads

    os.makedirs(CACHE, exist_ok=True)
    fa = os.path.join(CACHE, "ref.fa")
    fq = os.path.join(CACHE, "reads.fq")
    idx_dir = os.path.join(CACHE, "idx")
    if not os.path.exists(os.path.join(idx_dir, "deSAMBA.bwt")):
        log("bench: building data + index (one-time)")
        refs = make_references(seed=31, n_genomes=4, length=60_000)
        write_fasta(fa, refs)
        reads = make_reads(refs, seed=41, n_reads=N_READS,
                           read_len=(1000, 3000), err=0.10)
        write_fastq(fq, reads)
        idx = build_index(fa)
        save_ref_format(idx, idx_dir)
    return fa, fq, idx_dir


def bench_engine(idx_dir, fq):
    from desamba_tpu.index.format_ref import RefFormatIndex
    from desamba_tpu.io.fastx import read_fastx
    from desamba_tpu.engine.tpu_engine import TpuClassifier
    from desamba_tpu.oracle.classify import OracleIndex

    oi = OracleIndex(RefFormatIndex(idx_dir))
    eng = TpuClassifier(oi, sub_batch=128)
    reads = [(r.name, r.seq, r.qual) for r in read_fastx(fq)]
    # warmup (compile)
    t0 = time.time()
    eng.classify_to_sam(reads[:16], output_seq=False)
    log(f"bench: warmup {time.time()-t0:.1f}s")
    t0 = time.time()
    sam = eng.classify_to_sam(reads, output_seq=False)
    dt = time.time() - t0
    rps = len(reads) / dt
    log(f"bench: engine {len(reads)} reads in {dt:.2f}s = {rps:.2f} reads/s "
        f"(stats: {dict(eng.stats)})")
    return rps, sam


def bench_reference(idx_dir, fq):
    if not os.path.exists(REF_BIN):
        return None
    cachef = os.path.join(CACHE, "ref_rps.txt")
    if os.path.exists(cachef):
        return float(open(cachef).read())
    t0 = time.time()
    p = subprocess.run([REF_BIN, "classify", "-t", "1", idx_dir, fq],
                       capture_output=True)
    dt = time.time() - t0
    if p.returncode != 0:
        return None
    n = sum(1 for _ in open(fq)) // 4
    rps = n / dt
    with open(cachef, "w") as f:
        f.write(str(rps))
    log(f"bench: reference C (-t 1) {n} reads in {dt:.2f}s = {rps:.2f} reads/s")
    return rps


def main():
    fa, fq, idx_dir = prepare()
    rps, _ = bench_engine(idx_dir, fq)
    base = bench_reference(idx_dir, fq) or FALLBACK_BASELINE_RPS
    print(json.dumps({
        "metric": "classify_long_reads",
        "value": round(rps, 2),
        "unit": "reads/sec/chip",
        "vs_baseline": round(rps / base, 3),
    }))


if __name__ == "__main__":
    main()
