"""Cross-shard collectives for the classify/analysis pipeline.

The reference has no distributed backend (SURVEY.md section 2.3); these are
the TPU-native constructs that replace shared memory when scaling out:
  (a) taxon-weight reduction: meta_analysis's node_count accumulation
      (cly_mt.c:1192-1222) becomes a per-shard scatter-add over a dense
      [max_tid] vector + one psum over 'data' — the single collective the
      abundance report needs across hosts.
  (b) candidate merge: per-index-shard top chains all_gathered over 'index'
      so every shard sees the global candidate set before primary
      detection (host-side equivalent in shard_index.ShardedEngine).
"""
from __future__ import annotations

from functools import partial


def taxon_weight_step(mesh, max_tid: int):
    """Returns jit'd fn(tids:int32[B], weights:int32[B]) -> int32[max_tid]
    with B sharded over 'data'; output replicated (already psum'd)."""
    import jax
    import jax.numpy as jnp
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    def step(tids, weights):
        # int32 on device: one batch is <= 10 MB of bases (cly_mt.c:23), so
        # per-batch weights stay < 2^31; the host accumulates in int64
        t = jnp.clip(tids, 0, max_tid - 1)
        w = jnp.zeros((max_tid,), jnp.int32).at[t].add(
            weights.astype(jnp.int32))
        return jax.lax.psum(w, axis_name="data")

    return jax.jit(
        shard_map(step, mesh=mesh, in_specs=(P("data"), P("data")),
                  out_specs=P(), check_vma=False)
    )


def gather_candidates_step(mesh, per_shard: int):
    """Returns jit'd fn(scores:f32[B, per_shard], payload:i32[B, per_shard, K])
    with B sharded over 'data' and candidates local to each 'index' shard;
    all_gathers candidates over 'index' so every shard holds the global
    [B, n_index*per_shard] set (the cross-shard anchor merge of
    SURVEY.md section 2.3(a))."""
    import jax
    import jax.numpy as jnp
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    def step(scores, payload):
        gs = jax.lax.all_gather(scores, axis_name="index", axis=1, tiled=True)
        gp = jax.lax.all_gather(payload, axis_name="index", axis=1, tiled=True)
        order = jnp.argsort(-gs, axis=1, stable=True)
        gs = jnp.take_along_axis(gs, order, axis=1)
        gp = jnp.take_along_axis(gp, order[..., None], axis=1)
        return gs, gp

    return jax.jit(
        shard_map(step, mesh=mesh,
                  in_specs=(P("data", "index"), P("data", "index", None)),
                  out_specs=(P("data"), P("data", None, None)),
                  check_vma=False)
    )
