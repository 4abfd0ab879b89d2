"""Device mesh + sharding helpers.

The reference is a single-process pthread program (lib/kthread.c); its two
parallel axes map onto a JAX mesh (SURVEY.md section 2.2):
  * 'data'  — read-level parallelism (the kt_for analog, cly_mt.c:372):
              batches of reads are sharded over this axis.
  * 'index' — index sharding (no reference analog; needed when the FM
              index exceeds one chip's HBM): each index-shard holds a
              subset of the reference genomes (see shard_index.py).
"""
from __future__ import annotations

import os
from functools import partial

import numpy as np


def init_distributed(coordinator: str | None = None, num_processes: int | None = None,
                     process_id: int | None = None) -> None:
    """jax.distributed.initialize for multi-host pods; no-op when the
    environment provides no cluster (single-host dev)."""
    import jax

    if coordinator is None and "JAX_COORDINATOR_ADDRESS" not in os.environ \
            and "COORDINATOR_ADDRESS" not in os.environ:
        return
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)


def make_mesh(n_data: int | None = None, n_index: int = 1, devices=None):
    """Mesh over ('data', 'index'). Defaults: all devices on 'data'.

    When the default platform has fewer devices than requested (e.g. one
    real chip during development), falls back to the virtual CPU devices
    (xla_force_host_platform_device_count) so shardings still compile and
    execute — the driver's dryrun_multichip contract."""
    import jax
    from jax.sharding import Mesh

    if devices is None:
        devices = jax.devices()
        need = (n_data or 1) * n_index
        if len(devices) < need:
            cpus = jax.devices("cpu")
            if len(cpus) >= need:
                devices = cpus
    if n_data is None:
        n_data = len(devices) // n_index
    if len(devices) < n_data * n_index:
        raise ValueError(
            f"mesh {n_data}x{n_index} needs {n_data * n_index} devices, "
            f"have {len(devices)}")
    use = np.array(devices[: n_data * n_index]).reshape(n_data, n_index)
    return Mesh(use, ("data", "index"))


def replicated(mesh):
    from jax.sharding import NamedSharding, PartitionSpec as P

    return NamedSharding(mesh, P())


def data_sharded(mesh):
    from jax.sharding import NamedSharding, PartitionSpec as P

    return NamedSharding(mesh, P("data"))


def put_replicated(mesh, tree):
    """Place a pytree (e.g. FmArrays/EkArrays) replicated over the mesh."""
    import jax

    sh = replicated(mesh)
    return jax.tree_util.tree_map(partial(jax.device_put, device=sh), tree)


def put_batch(mesh, *arrays):
    """Shard leading (batch) axis over 'data'. Batch must divide n_data."""
    import jax

    sh = data_sharded(mesh)
    out = tuple(jax.device_put(a, sh) for a in arrays)
    return out if len(out) > 1 else out[0]


def pad_batch(n: int, n_data: int) -> int:
    """Rows to pad a batch of n reads so it splits evenly over 'data'."""
    return (-n) % n_data
