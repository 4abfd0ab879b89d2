"""Data-parallel device dispatch of the seed-match front end.

Wraps the two large lockstep device stages of the TPU engine — exist-filter
probing (ops/ekmer.py, the search_exist_kmer_M2 analog cly.c:1066-1155) and
FM interval search (ops/fm.py, the bwt_MEM_search analog cly.c:1383-1442) —
in a shard_map over the 'data' mesh axis with the index replicated, the
kt_for read-parallelism of the reference (lib/kthread.c:61-86) expressed as
SPMD over chips.
"""
from __future__ import annotations

from functools import partial


def make_seed_search_step(mesh, fm, ek):
    """Returns (step_fn, place) where step_fn is a jit'd shard_map:

      step_fn(fm, w0, w1, codes:u8[B,W], lengths:i32[B], bin2:i32[B,W2],
              s_idx, sp0, ep0, max_rst, l_min, l_max)
        -> (exists:u8[B,W-lek+1-ish], fm results dict)

    B is sharded over 'data'; fm/ek arrays replicated. `place(...)` puts
    host arrays with the right shardings."""
    import jax
    import jax.numpy as jnp
    from jax import shard_map
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..ops.ekmer import _probe_reads
    from ..ops.fm import interval_search

    lek = ek.lek
    sbm = ek.single_base_max
    mask_bits = ek.mask_bits
    nw0 = ek.n_words0

    def step(fm, w01, codes, lengths, bin2, s_idx, sp0, ep0,
             max_rst, l_min, l_max):
        ex = _probe_reads(w01, codes, lengths, lek, sbm, mask_bits,
                          n_words0=nw0)
        res = interval_search(fm, bin2, 0, s_idx, sp0, ep0,
                              max_rst, l_min, l_max)
        return ex, res

    fm_specs = jax.tree_util.tree_map(lambda _: P(), fm)
    d = P("data")
    step_fn = jax.jit(
        shard_map(
            step, mesh=mesh,
            in_specs=(fm_specs, P(), d, d, d, d, d, d, d, d, d),
            out_specs=(d, dict(sp=d, ep=d, match_len=d, ptr=d, status=d)),
            check_vma=False,
        )
    )
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))
    fm_r = jax.tree_util.tree_map(partial(jax.device_put, device=repl), fm)
    w01_r = jax.device_put(ek.w01, repl)

    def place(codes, lengths, bin2, s_idx, sp0, ep0, max_rst, l_min, l_max):
        putd = partial(jax.device_put, device=data)
        return (fm_r, w01_r, putd(codes), putd(lengths), putd(bin2),
                putd(s_idx), putd(sp0), putd(ep0), putd(max_rst),
                putd(l_min), putd(l_max))

    return step_fn, place
