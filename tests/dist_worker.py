"""Multi-process jax.distributed worker.

Spawned (2 processes) by tests/test_parallel.py::test_distributed_multiprocess.
Each process owns 2 virtual CPU devices; the pair forms one 4-device 'data'
mesh across process boundaries (the multi-host shape of SURVEY.md section 2.3,
scaled down to one machine). Exercises:
  * parallel.mesh.init_distributed (jax.distributed.initialize wrapper)
  * a REAL cross-process collective: the meta_analysis taxon-weight psum
    (parallel/collectives.taxon_weight_step) over process-local read calls —
    the one collective the abundance report needs across hosts
    (cly_mt.c:1192-1222 becomes scatter-add + psum).

Every process must end by printing "DIST_WORKER_OK <pid>"; the parent test
asserts both markers and the shared total.
"""
import os
import sys

PID = int(sys.argv[1])
NPROC = int(sys.argv[2])
PORT = sys.argv[3]

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"

import jax  # noqa: E402

# env vars are latched before this process's main() (the axon sitecustomize
# imports jax at startup), so the platform override must go through config
jax.config.update("jax_platforms", "cpu")
# CPU cross-process collectives need the gloo backend (XLA's CPU client is
# process-local without it)
jax.config.update("jax_cpu_collectives_implementation", "gloo")

import numpy as np  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

from desamba_tpu.parallel.collectives import taxon_weight_step  # noqa: E402
from desamba_tpu.parallel.mesh import init_distributed, make_mesh  # noqa: E402

init_distributed(f"127.0.0.1:{PORT}", num_processes=NPROC, process_id=PID)
assert jax.process_count() == NPROC, jax.process_count()
assert jax.local_device_count() == 2
mesh = make_mesh(n_data=2 * NPROC)

# process-local classified reads: process p called tids [p+1, p+1, 5] with
# read-count weights -> global expectation is deterministic
MAX_TID = 8
local_tids = np.array([PID + 1, PID + 1, 5, 0], np.int32)
local_w = np.array([1, 1, 1, 0], np.int32)
sh = NamedSharding(mesh, P("data"))
gt = jax.make_array_from_process_local_data(sh, local_tids, (4 * NPROC,))
gw = jax.make_array_from_process_local_data(sh, local_w, (4 * NPROC,))
step = taxon_weight_step(mesh, MAX_TID)
w = np.asarray(step(gt, gw))
expect = np.zeros(MAX_TID, np.int32)
for p in range(NPROC):
    expect[p + 1] += 2
    expect[5] += 1
assert (w == expect).all(), (w, expect)
print(f"DIST_WORKER_OK {PID} total={int(w.sum())}", flush=True)
