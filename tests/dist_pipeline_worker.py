"""Weak-scaling worker: the FULL FastClassifier device pipeline over a
cross-process data mesh (VERDICT r3 item 6).

Spawned by tests/test_parallel.py::test_weak_scaling_pipeline twice with
the SAME 4-device global mesh split over 1 or 2 OS processes:

    NPROC=1: one process, 4 virtual CPU devices
    NPROC=2: two processes x 2 devices, jax.distributed + gloo

Same total devices, same global batch — the throughput ratio isolates the
cross-process communication cost of the data-mesh pipeline (the closest
weak-scaling proxy a single-chip 2-core host allows; on real multi-chip
hardware the same shardings ride ICI).

Each process: builds the FastClassifier over the golden index with the
global mesh, dispatches the fused pipeline (mesh path _run_mesh ->
make_array_from_process_local_data), validates its OWN result shard
against the single-device engine, then times repeated dispatches.
Prints "DIST_PIPE_OK <pid> rps=<reads/s>".
"""
import os
import sys
import time

PID = int(sys.argv[1])
NPROC = int(sys.argv[2])
PORT = sys.argv[3]
IDX_DIR = sys.argv[4]

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

NDEV_TOTAL = 4
os.environ["XLA_FLAGS"] = (
    f"--xla_force_host_platform_device_count={NDEV_TOTAL // NPROC}")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
if NPROC > 1:
    jax.config.update("jax_cpu_collectives_implementation", "gloo")

import numpy as np  # noqa: E402

from desamba_tpu.engine.fast_engine import FastClassifier, _unpack_rows  # noqa: E402
from desamba_tpu.index.format_ref import RefFormatIndex  # noqa: E402
from desamba_tpu.oracle.classify import OracleIndex  # noqa: E402
from desamba_tpu.parallel.mesh import init_distributed, make_mesh  # noqa: E402
from testdata import make_reads  # noqa: E402

if NPROC > 1:
    init_distributed(f"127.0.0.1:{PORT}", num_processes=NPROC,
                     process_id=PID)
    assert jax.process_count() == NPROC

mesh = make_mesh(n_data=NDEV_TOTAL)
oi = OracleIndex(RefFormatIndex(IDX_DIR))
cl = FastClassifier(oi, mesh=mesh, exact_fallback=False)

# reads straight from the packed reference (deterministic in every process)
seqs = []
code2ch = np.frombuffer(b"ACGT", np.uint8)
for r in range(len(oi.ref_names)):
    off = int(oi.ref_offset[r])
    ln = int(oi.ref_len[r])
    codes = oi.get_ref(off, ln, True)
    seqs.append((oi.ref_names[r], code2ch[codes].tobytes()))
reads = make_reads(seqs, seed=11, n_reads=64, read_len=(600, 1000),
                   err=0.10)

B = len(reads)
W = 1024
packed, lens_p, lens = cl._encode(reads, W=W, Bp=B)
handles = cl._run_mesh(packed, lens_p)

# validate OWN shard rows against the single-device engine
single = FastClassifier(oi, exact_fallback=False)
ref_rows = np.asarray(single._run(packed, lens_p))
mine = sorted(handles.addressable_shards, key=lambda s: s.index[1].start)
got = np.concatenate([np.asarray(s.data) for s in mine], axis=1)
lo = min(s.index[1].start for s in handles.addressable_shards)
hi = max(s.index[1].stop for s in handles.addressable_shards)
exp = ref_rows[:, lo:hi]
assert got.shape == exp.shape, (got.shape, exp.shape)
# rows 0-4 = score/ref/direction/cov/pos and 6 = n_exist must be exact;
# row 5 (score_alt, the replay-gate runner-up) may differ: the stage-2
# anchor-compaction caps scale with the per-shard lane count, so a
# truncated anchor can change which OTHER genome scored second
rows = [0, 1, 2, 3, 4, 6]
assert (got[rows] == exp[rows]).all(), (
    f"shard rows [{lo}:{hi}] diverge from single-device")

# timed: repeated full-pipeline dispatches of the global batch
for _ in range(2):  # warm
    jax.block_until_ready(cl._run_mesh(packed, lens_p))
n_it = 6
t0 = time.time()
for _ in range(n_it):
    jax.block_until_ready(cl._run_mesh(packed, lens_p))
dt = (time.time() - t0) / n_it
rps = B / dt
print(f"DIST_PIPE_OK {PID} rps={rps:.1f}", flush=True)
