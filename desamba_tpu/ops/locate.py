"""Device-side BWT-row -> reference-position resolution.

The TPU analog of get_uni (cly.c:466-491) + the SA-sample walk of
bwt_single_search (cly.c:1353-1359): from a BWT row, LF-step (lockstep,
masked) until a sampled row (row % 8 == 0, NUM_BP_OCCUPY_ONE_SA bwt.h:6-8),
then map (sa_uni, sa_off + steps + 1) to a unitig-string position via a
precomputed cumulative unitig-start table and binary search — the scalar
forward walk over the unitig CSR of the reference becomes one searchsorted.

Coordinates: unitig u occupies [uni_start[u], uni_start[u] + uni_len[u])
in the concatenated unitig string (each unitig followed by one sentinel),
so position p resolves to u = searchsorted(uni_start, p, 'right') - 1 and
u_off = p - uni_start[u]; the anchor's global reference offset for the
rp-th occurrence is refpos_global[rp] + u_off (map_seed, cly.c:735).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .fm import FmArrays, lf_cur


class LocArrays:
    """Device-resident locate tables (a jax pytree)."""

    def __init__(self, ti=None, device=None, _from=None):
        if _from is not None:
            (self.uni_start, self.uni_len, self.reflist, self.refpos_global,
             self.refpos_refid, self.ref_offset), () = _from
            return
        put = partial(jax.device_put, device=device)
        ul = np.asarray(ti.uni_len, dtype=np.int64)
        starts = np.zeros(ul.size + 1, dtype=np.int64)
        np.cumsum(ul + 1, out=starts[1:])
        if starts[-1] >= 2**31 or np.asarray(ti.refpos_global).max(initial=0) >= 2**31:
            raise NotImplementedError(
                "index shard exceeds int32 coordinate space; shard the index "
                "(parallel/shard_index.py)")
        self.uni_start = put(jnp.asarray(starts, dtype=jnp.int32))
        self.uni_len = put(jnp.asarray(ul, dtype=jnp.int32))
        self.reflist = put(jnp.asarray(ti.uni_reflist, dtype=jnp.int32))
        self.refpos_global = put(jnp.asarray(ti.refpos_global, dtype=jnp.int32))
        self.refpos_refid = put(jnp.asarray(ti.refpos_refid, dtype=jnp.int32))
        self.ref_offset = put(jnp.asarray(ti.ref_offset, dtype=jnp.int32))


jax.tree_util.register_pytree_node(
    LocArrays,
    lambda lc: ((lc.uni_start, lc.uni_len, lc.reflist, lc.refpos_global,
                 lc.refpos_refid, lc.ref_offset), ()),
    lambda aux, leaves: LocArrays(_from=(leaves, aux)),
)


def resolve_rows(fm: FmArrays, loc: LocArrays, rows, valid, max_lf: int = 24):
    """Resolve BWT rows to unitig-string positions.

    rows: int32[B]; valid: bool[B] (invalid lanes skipped).
    Returns dict(pos=int32[B] unitig-string position of the row's suffix
    start, uni=int32[B], u_off=int32[B], ok=bool[B]). Lanes that hit a
    sentinel ('#'/'$') before a sample, or take > max_lf steps, get ok=False.
    """
    rows = jnp.asarray(rows, jnp.int32)
    B = rows.shape[0]

    def body(_, st):
        r, k, done, bad = st
        at_sample = (r & 7) == 0
        newly_done = (~done) & at_sample
        done2 = done | newly_done
        c, nxt = lf_cur(fm, jnp.clip(r, 0, fm.pad.shape[0] - 1))
        stepping = ~done2 & ~bad
        bad2 = bad | (stepping & (c >= 4))  # sentinel/pad: position unsafe
        r2 = jnp.where(stepping & (c < 4), nxt, r)
        k2 = jnp.where(stepping & (c < 4), k + 1, k)
        return r2, k2, done2, bad2

    k0 = jnp.zeros(B, jnp.int32)
    done0 = jnp.zeros(B, jnp.bool_)
    bad0 = ~jnp.asarray(valid, jnp.bool_)
    r, k, done, bad = jax.lax.fori_loop(0, max_lf + 1, body, (rows, k0, done0, bad0))
    ok = done & ~bad
    s = jnp.clip(r >> 3, 0, fm.sa_uni.shape[0] - 1)
    # text pos = sa_off + steps + 1 (the get_uni convention, cly.c:477)
    p = loc.uni_start[fm.sa_uni[s]] + fm.sa_off[s] + k + 1
    u = jnp.clip(
        jnp.searchsorted(loc.uni_start, p, side="right").astype(jnp.int32) - 1,
        0, loc.uni_len.shape[0] - 1)
    u_off = p - loc.uni_start[u]
    return dict(pos=p, uni=u, u_off=u_off, ok=ok)


def expand_refpos(loc: LocArrays, uni, u_off, ok, P: int = 4):
    """Up to P reference occurrences per resolved anchor (cly.c:698-741).

    Returns (ref_id int32[B,P], gpos int32[B,P], valid bool[B,P])."""
    rp_s = loc.reflist[uni]
    rp_e = loc.reflist[jnp.clip(uni + 1, 0, loc.reflist.shape[0] - 1)]
    k = jnp.arange(P, dtype=jnp.int32)[None, :]
    rp = rp_s[:, None] + k
    val = ok[:, None] & (rp < rp_e[:, None])
    rp_c = jnp.clip(rp, 0, loc.refpos_global.shape[0] - 1)
    gpos = loc.refpos_global[rp_c] + u_off[:, None]
    ref = loc.refpos_refid[rp_c]
    return ref, gpos, val
