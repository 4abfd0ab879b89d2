"""Sharded-vs-monolithic validation at REALISTIC SCALE (VERDICT r4 item 1).

Every sharded/multi-chip claim previously rested on the 90 kb golden set;
this runs the ShardedFastClassifier (genome-sharded index on a
('data','index') mesh, engine/sharded_fast.py) against the 100 Mbp
community on >= 10k reads of 1-3 kb WITH exact_fallback=True, and
compares its taxon calls to the monolithic engine's on the same reads.

Two-phase (separate processes so each leg picks its backend):
  phase mono   — monolithic FastClassifier (TPU if attached, else CPU),
                 exact_fallback=True; dumps per-read tid calls.
  phase shard  — ShardedFastClassifier over the 2-shard build of the SAME
                 fasta on an 8-virtual-CPU-device (data=4, index=2) mesh,
                 exact_fallback=True; compares and writes SHARDED_r05.json.

Usage:
  python tools/sharded_validate.py mono  [n_reads]
  python tools/sharded_validate.py shard [n_reads]
  python tools/sharded_validate.py both  [n_reads]   # spawns the two

Inputs (built by bench.py / tools/build_shards2 path):
  /tmp/desamba_tpu_bench/ref_100M.fa        the community fasta
  /tmp/desamba_tpu_bench/idx_100M           monolithic index
  /tmp/desamba_scale_shards2                2-shard build + manifest
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time

R = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, R)
sys.path.insert(0, os.path.join(R, "tests"))

FA = "/tmp/desamba_tpu_bench/ref_100M.fa"
IDX = "/tmp/desamba_tpu_bench/idx_100M"
SHARDS = "/tmp/desamba_scale_shards2"
CALLS = "/tmp/desamba_tpu_bench/sharded_validate_mono.json"
ART = os.path.join(R, "SHARDED_r05.json")


def _reads(n_reads):
    from desamba_tpu.io.fastx import read_fastx
    from scale_data import make_reads_vec

    refs = [(r.name, r.seq) for r in read_fastx(FA)]
    return make_reads_vec(refs, seed=7070, n_reads=n_reads,
                          read_len=(1_000, 3_000), err=0.10)


def truth_tid(name: str) -> int:
    return int(name.split("_")[1].split(".")[0])


def phase_mono(n_reads):
    from desamba_tpu.engine.fast_engine import FastClassifier
    from desamba_tpu.index.format_ref import RefFormatIndex
    from desamba_tpu.oracle.classify import OracleIndex

    reads = _reads(n_reads)
    t0 = time.time()
    cl = FastClassifier(OracleIndex(RefFormatIndex(IDX)),
                        exact_fallback=True)
    print(f"mono: init {time.time()-t0:.0f}s", flush=True)
    t0 = time.time()
    cl.classify_batch(reads, block=4096)  # warm: compiles EVERY shape
    print(f"mono: warm full pass {time.time()-t0:.0f}s", flush=True)
    cl.stats = dict(n_reads=0, n_fallback=0)
    t0 = time.time()
    res = cl.classify_batch(reads, block=4096)
    dt = time.time() - t0
    tids = [cl.tid_of(r.ref_ID) for r in res]
    out = dict(n=len(reads), rps=len(reads) / dt,
               fallback=cl.stats["n_fallback"] / max(1, cl.stats["n_reads"]),
               tids=tids)
    with open(CALLS, "w") as f:
        json.dump(out, f)
    print(f"mono: {len(reads)} reads in {dt:.1f}s = {len(reads)/dt:.0f} "
          f"reads/s, fallback {out['fallback']:.3f}", flush=True)


def phase_shard(n_reads):
    import jax

    # the baked axon sitecustomize forces jax_platforms="axon,cpu" at
    # interpreter start, overriding the env var — pin CPU the way
    # tests/conftest.py does, BEFORE any backend initializes
    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass

    from desamba_tpu.engine.sharded_fast import load_sharded_fast
    from desamba_tpu.parallel import make_mesh

    reads = _reads(n_reads)
    mono = json.load(open(CALLS))
    assert mono["n"] == len(reads)
    n_dev = len(jax.devices())
    mesh = make_mesh(n_data=n_dev // 2, n_index=2)
    t0 = time.time()
    cl = load_sharded_fast(SHARDS, mesh=mesh, exact_fallback=True)
    print(f"shard: init {time.time()-t0:.0f}s on mesh "
          f"{dict(mesh.shape)}", flush=True)
    t0 = time.time()
    cl.classify_batch(reads[:256])  # warm/compile
    print(f"shard: warm (incl. compiles) {time.time()-t0:.0f}s", flush=True)
    cl.stats = dict(n_reads=0, n_fallback=0)
    t0 = time.time()
    res = cl.classify_batch(reads)
    dt = time.time() - t0
    tids = [cl.tid_of(r.ref_ID) for r in res]
    truth = [truth_tid(r[0]) for r in reads]
    agree = sum(a == b for a, b in zip(tids, mono["tids"]))
    acc_s = sum(a == t for a, t in zip(tids, truth)) / len(reads)
    acc_m = sum(a == t for a, t in zip(mono["tids"], truth)) / len(reads)
    diffs = [(i, mono["tids"][i], tids[i])
             for i in range(len(reads)) if tids[i] != mono["tids"][i]]
    # classify the disagreements: sharded-unclassified / mono-unclassified
    # / different taxon
    d_un_s = sum(1 for _, m, s in diffs if s == 0 and m != 0)
    d_un_m = sum(1 for _, m, s in diffs if m == 0 and s != 0)
    d_tax = len(diffs) - d_un_s - d_un_m
    art = dict(
        scale_bp=100_600_000, n_shards=2, n_reads=len(reads),
        read_len="1000-3000", err=0.10, exact_fallback=True,
        mesh={k: int(v) for k, v in mesh.shape.items()},
        agreement=round(agree / len(reads), 4),
        n_diff=len(diffs), diff_sharded_unclassified=d_un_s,
        diff_mono_unclassified=d_un_m, diff_other_taxon=d_tax,
        truth_accuracy_sharded=round(acc_s, 4),
        truth_accuracy_monolithic=round(acc_m, 4),
        sharded_rps_cpu_mesh=round(len(reads) / dt, 1),
        mono_rps=round(mono["rps"], 1),
        mono_fallback=round(mono["fallback"], 4),
        sharded_fallback=round(
            cl.stats["n_fallback"] / max(1, cl.stats["n_reads"]), 4),
        note="sharded leg on 8 virtual CPU devices (one physical chip "
             "host); mono leg on the attached TPU — throughputs are not "
             "comparable across legs, agreement/accuracy are the contract")
    with open(ART, "w") as f:
        json.dump(art, f, indent=1)
    print(json.dumps(art, indent=1), flush=True)


def main():
    phase = sys.argv[1] if len(sys.argv) > 1 else "both"
    n_reads = int(sys.argv[2]) if len(sys.argv) > 2 else 10_240
    if phase == "mono":
        phase_mono(n_reads)
    elif phase == "shard":
        phase_shard(n_reads)
    else:
        subprocess.run([sys.executable, __file__, "mono", str(n_reads)],
                       check=True)
        env = dict(os.environ,
                   JAX_PLATFORMS="cpu",
                   XLA_FLAGS=os.environ.get("XLA_FLAGS", "")
                   + " --xla_force_host_platform_device_count=8")
        subprocess.run([sys.executable, __file__, "shard", str(n_reads)],
                       check=True, env=env)


if __name__ == "__main__":
    main()
