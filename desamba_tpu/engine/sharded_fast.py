"""Device 'index'-axis sharded fast classifier.

When the reference set exceeds one chip's HBM (full-RefSeq FM indexes are
10s-of-GB, SURVEY.md section 7 "Memory"), the index is sharded by GENOME:
each shard is a complete self-contained sub-index over a subset of the
reference sequences (parallel/shard_index.py builds them). This module puts
those shards on the 'index' axis of a ('data', 'index') mesh and runs the
fast pipeline (engine/fast_engine.py stages 1-4) shard-locally, then merges
candidates with one all_gather over 'index' (stage 5) — the cross-shard
candidate merge of SURVEY.md section 2.3(a), riding ICI.

Genome sharding — not row-sharding the FM occ tables — is the TPU-native
answer because every FM backward extension is a sequential chain of
data-dependent occ() gathers (bwt.c:43-65): rows jump anywhere in the BWT,
so row-sharding would turn each of the ~20 LF steps per seed into an
all-to-all. With genome shards every gather in stages 1-4 stays local to
one device; the ONLY cross-shard traffic is the [n_index, B] candidate
merge at the end.

Layout: per-shard arrays are edge-padded to the max shard shape and stacked
on a new leading axis sharded PartitionSpec('index'); device (d, i) holds
shard i's arrays and read rows of data-slice d (reads replicated over
'index'). Edge padding (repeat last element) keeps cumulative tables
(uni_start, reflist CSR, ref_offset, hash13) monotonic so searchsorted
stays correct; padded FM rows are never addressed (occ arguments are
bounded by each shard's own interval values).

Capacity: this is the path that lifts the per-shard walls in
ops/ekmer.py (4 GiB exist filter), ops/locate.py (2^31 unitig-string
coords) and ops/refwin.py (2^31 bp reference) — each shard only has to fit
one chip.
"""
from __future__ import annotations

import os
from functools import partial
from types import SimpleNamespace

import numpy as np

from .fast_engine import (
    AMB_MARGIN,
    FastClassifier,
    _band,
    _build_stages,
    _enable_compile_cache,
    _pack7,
    stage0_unpack,
)


def _edge_pad_stack(arrs):
    """Stack numpy/jax arrays along a new axis 0, edge-padding axis 0 of
    each to the max length (other dims must already match)."""
    arrs = [np.asarray(a) for a in arrs]
    if arrs[0].ndim == 0:
        return np.stack(arrs)
    n = max(a.shape[0] for a in arrs)
    out = []
    for a in arrs:
        if a.shape[0] < n:
            pad = [(0, n - a.shape[0])] + [(0, 0)] * (a.ndim - 1)
            a = np.pad(a, pad, mode="edge")
        out.append(a)
    return np.stack(out)


def _stack_shard_trees(trees, mesh):
    """Per-shard pytrees (same structure/aux) -> one pytree of stacked
    leaves, leading axis sharded over 'index'."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    flats = [jax.tree_util.tree_flatten(t) for t in trees]
    treedef = flats[0][1]
    for s, f in enumerate(flats[1:], 1):
        if f[1] != treedef:
            # a mismatch means static aux differs per shard — stacking
            # would silently adopt shard 0's value for all shards
            raise ValueError(
                f"shard {s} pytree structure/static-aux differs from "
                f"shard 0: {f[1]} vs {treedef}")
    sh = NamedSharding(mesh, P("index"))
    leaves = [
        jax.device_put(_edge_pad_stack([f[0][i] for f in flats]), sh)
        for i in range(len(flats[0][0]))
    ]
    return jax.tree_util.tree_unflatten(treedef, leaves)


def _local(tree):
    """Strip the leading per-shard axis inside a shard_map body."""
    import jax

    return jax.tree_util.tree_map(lambda x: x[0], tree)


class ShardedFastClassifier(FastClassifier):
    """Fast classifier over a genome-sharded index on a ('data','index')
    mesh. Reads are data-parallel; each index shard scores its genomes;
    stage 5 all_gathers the per-shard winners and applies the same
    score-then-tie-order combine as the monolithic stage 4 (odd top score
    -> highest global ref_ID, even -> lowest; cly.c:53-63 via glibc
    mergesort, see fast_engine.stage4).

    `ois` are per-shard OracleIndexes in manifest order. `ref_ids` (one
    int sequence per shard) maps shard-local ref r to its GLOBAL ref_ID —
    pass the original monolithic fasta order (the manifest's `ref_order`)
    so the odd/even tie rule picks the same genome a monolithic run
    would; default is shard-concatenation order. With exact_fallback=True,
    ambiguous reads replay through the host ShardedEngine (exact
    per-shard classify + global merge)."""

    def __init__(self, ois, mesh, min_score=None, filter_min_length=None,
                 exact_fallback: bool = False,
                 fallback_threads: int | None = None, ref_ids=None,
                 amb_margin: int | None = None):
        from ..constants import DEFAULT_FILTER_MIN_LENGTH, DEFAULT_MIN_SCORE

        if amb_margin is None:
            # scale rule on the TOTAL row count: sharding splits rows but
            # not the genome neighborhood a read competes against
            from .fast_engine import AMB_LARGE_L, AMB_MARGIN, AMB_MARGIN_LARGE

            total_l = sum(int(oi.L) for oi in ois)
            amb_margin = (AMB_MARGIN if total_l < AMB_LARGE_L
                          else AMB_MARGIN_LARGE)

        _enable_compile_cache()
        import jax

        from ..index.tensor_index import from_oracle_index
        from ..ops.ekmer import EkArrays
        from ..ops.fm import FmArrays
        from ..ops.locate import LocArrays
        from ..ops.refwin import RefArrays

        if "index" not in mesh.shape or mesh.shape["index"] != len(ois):
            raise ValueError(
                f"mesh 'index' axis ({mesh.shape.get('index')}) must equal "
                f"the shard count ({len(ois)})")
        self.ois = ois
        self.mesh = mesh
        self.min_score = (DEFAULT_MIN_SCORE if min_score is None
                          else min_score)
        self.filter_min_length = (DEFAULT_FILTER_MIN_LENGTH
                                  if filter_min_length is None
                                  else filter_min_length)
        cpu = jax.devices("cpu")[0]
        tis = [from_oracle_index(oi) for oi in ois]
        eks = [EkArrays(ti, device=cpu) for ti in tis]
        lek, sbm, mb = eks[0].lek, eks[0].single_base_max, eks[0].mask_bits
        nw0 = eks[0].n_words0
        for e in eks[1:]:
            if (e.lek, e.single_base_max, e.mask_bits,
                    e.n_words0) != (lek, sbm, mb, nw0):
                raise ValueError(
                    "shards have heterogeneous exist-filter params "
                    "(ek_params_for, index/build.py); rebuild the shards "
                    "balanced so every shard lands in the same size bucket")
        self.ek = SimpleNamespace(lek=lek, single_base_max=sbm, mask_bits=mb,
                                  n_words0=nw0)
        self.fm_s = _stack_shard_trees(
            [FmArrays(ti, device=cpu) for ti in tis], mesh)
        self.ek_s = _stack_shard_trees(eks, mesh)
        self.loc_s = _stack_shard_trees(
            [LocArrays(ti, device=cpu) for ti in tis], mesh)
        self.ra_s = _stack_shard_trees(
            [RefArrays(ti, device=cpu) for ti in tis], mesh)
        # global ref numbering: caller-provided (original fasta order) or
        # shard-order concatenation
        n_total = sum(len(oi.ref_names) for oi in ois)
        if ref_ids is None:
            ref_ids, b = [], 0
            for oi in ois:
                ref_ids.append(list(range(b, b + len(oi.ref_names))))
                b += len(oi.ref_names)
        self.ref_names = [None] * n_total
        concat2global = []
        for oi, ids in zip(ois, ref_ids):
            assert len(ids) == len(oi.ref_names)
            for r, g in enumerate(ids):
                self.ref_names[g] = oi.ref_names[r]
            concat2global.extend(ids)
        self._concat2global = np.asarray(concat2global, np.int32)
        from jax.sharding import NamedSharding, PartitionSpec as P

        self.ref_map = jax.device_put(
            _edge_pad_stack([np.asarray(ids, np.int32) for ids in ref_ids]),
            NamedSharding(mesh, P("index")))
        self._build_sharded_stages()
        self._code = np.full(256, 1, np.uint8)
        for j, b in enumerate(b"ACGT"):
            self._code[b] = j
        for j, b in enumerate(b"acgt"):
            self._code[b] = j
        self.exact_fallback = exact_fallback
        self.amb_margin = amb_margin
        self.max_width = 8192  # classify_batch long-read block partition cap
        self._fallback_threads = fallback_threads or min(
            8, os.cpu_count() or 1)
        self._native = None  # lazy host ShardedEngine for replays
        import threading

        self._replay_lock = threading.Lock()
        self.stats = dict(n_reads=0, n_fallback=0)

    # --------------------------------------------------------- stage build --
    def _build_sharded_stages(self):
        import jax
        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        s1, s2, s3, s4 = _build_stages(
            self.ek.lek, self.ek.single_base_max, self.ek.mask_bits,
            min_match=20, nw0=self.ek.n_words0)
        mesh = self.mesh
        IX = lambda t: jax.tree_util.tree_map(lambda _: P("index"), t)  # noqa: E731
        DI = P("index", "data")  # per-(index, data)-shard intermediates

        def b0(packed, lens):
            # device-side unpack + RC (stage0_unpack): each data shard
            # derives its own [fwd; rc] rows, so strand pairs stay
            # shard-local and result rows keep original read order
            return stage0_unpack(packed, lens)

        def b1(ek, codes2, lengths2):
            import jax.numpy as jnp

            ek = _local(ek)
            lo26, kidx, runlen, n_exist = s1(ek.w01, codes2, lengths2)
            Bl = codes2.shape[0] // 2
            ne = n_exist[:Bl] + n_exist[Bl:]  # strand fold, shard-local
            return tuple(x[None] for x in (lo26, kidx, runlen, ne))

        def b2(fm, codes_i, lengths2, lo26, kidx, runlen):
            out = s2(_local(fm), codes_i, lengths2,
                     lo26[0], kidx[0], runlen[0])
            return tuple(x[None] for x in out)

        def b3(fm, loc, lengths2, fsp, hit, tot, qleft, sel, B2, nwR):
            out = s3(_local(fm), _local(loc), lengths2,
                     fsp[0], hit[0], tot[0], qleft[0], sel[0],
                     B2=B2, nwR=nwR)
            return tuple(x[None] for x in out)

        def b4(ra, ref_map, read_w2, lengths2, ref_c, diag_c, vote_c,
               B2, K):
            import jax.numpy as jnp

            out = s4(_local(ra), read_w2, lengths2,
                     ref_c[0], diag_c[0], vote_c[0], B2=B2, K=K)
            # local -> global ref numbering for the cross-shard merge
            rl = out["ref"]
            out["ref"] = jnp.where(
                rl >= 0, ref_map[0][jnp.clip(rl, 0, ref_map.shape[1] - 1)],
                -1)
            return {k: v[None] for k, v in out.items()}

        def b5(res):
            """all_gather over 'index' + the monolithic tie-order combine."""
            import jax.numpy as jnp

            g = {k: jax.lax.all_gather(v[0], axis_name="index", axis=0,
                                       tiled=False)
                 for k, v in res.items()}  # [n_index, Bl]
            sc = jnp.where(g["ref"] >= 0, g["score"], -1)
            s_max = sc.max(axis=0)
            odd = (s_max & 1) == 1
            at_max = sc == s_max[None, :]
            NREF = len(self.ref_names)
            r_hi = jnp.where(at_max, g["ref"], -1).max(axis=0)
            r_lo = jnp.where(at_max, g["ref"], NREF + 1).min(axis=0)
            r_best = jnp.where(odd, r_hi, r_lo)
            chosen = at_max & (g["ref"] == r_best[None, :])
            sb = jnp.argmax(chosen, axis=0)
            cols = jnp.arange(sc.shape[1])
            ref_b = jnp.where(s_max > 0, r_best, -1)
            other = (g["ref"] != ref_b[None, :]) & (g["ref"] >= 0)
            alt = jnp.maximum(jnp.where(other, sc, -1).max(axis=0),
                              g["score_alt"].max(axis=0))
            return dict(
                score=jnp.maximum(s_max, 0),
                ref=ref_b,
                direction=jnp.where(ref_b >= 0, g["direction"][sb, cols], 0),
                cov=g["cov"][sb, cols],
                pos=jnp.where(ref_b >= 0, g["pos"][sb, cols], -1),
                score_alt=jnp.maximum(alt, 0),
            )

        self._sm0 = jax.jit(shard_map(
            b0, mesh=mesh, in_specs=(P("data"), P("data")),
            out_specs=(P("data"), P("data")), check_vma=False))
        from .fast_engine import _read_words

        # per-data-shard [fwd; rc] word rows — same strand-pair-local
        # row convention as b0 (see stage0_unpack docstring)
        self._smw = jax.jit(shard_map(
            _read_words, mesh=mesh, in_specs=(P("data"),),
            out_specs=P("data"), check_vma=False))
        self._sm1 = jax.jit(shard_map(
            b1, mesh=mesh, in_specs=(IX(self.ek_s), P("data"), P("data")),
            out_specs=(DI,) * 4, check_vma=False))
        self._sm2 = jax.jit(shard_map(
            b2, mesh=mesh,
            in_specs=(IX(self.fm_s), P("data"), P("data"), DI, DI, DI),
            out_specs=(DI,) * 5, check_vma=False))
        cache: dict = {}

        def sm3(B2l, nwR):
            key = ("s3", B2l, nwR)
            if key not in cache:
                cache[key] = jax.jit(shard_map(
                    partial(b3, B2=B2l, nwR=nwR), mesh=mesh,
                    in_specs=(IX(self.fm_s), IX(self.loc_s), P("data"),
                              DI, DI, DI, DI, DI),
                    out_specs=(DI,) * 3, check_vma=False))
            return cache[key]

        def sm4(B2l, K):
            key = ("s4", B2l, K)
            if key not in cache:
                cache[key] = jax.jit(shard_map(
                    partial(b4, B2=B2l, K=K), mesh=mesh,
                    in_specs=(IX(self.ra_s), P("index"), P("data"),
                              P("data"), DI, DI, DI),
                    out_specs={k: DI for k in (
                        "score", "ref", "direction", "cov", "pos",
                        "score_alt")},
                    check_vma=False))
            return cache[key]

        self._sm3 = sm3
        self._sm4 = sm4
        self._sm5 = jax.jit(shard_map(
            b5, mesh=mesh,
            in_specs=({k: DI for k in ("score", "ref", "direction", "cov",
                                       "pos", "score_alt")},),
            out_specs={k: P("data") for k in (
                "score", "ref", "direction", "cov", "pos", "score_alt")},
            check_vma=False))

    # ---------------------------------------------------------------- run --
    def _run_mesh(self, packed, lens):
        import jax
        import jax.numpy as jnp
        from jax.sharding import NamedSharding, PartitionSpec as P

        data = NamedSharding(self.mesh, P("data"))
        packed = jax.device_put(packed, data)
        lens = jax.device_put(lens, data)
        codes2, lengths2 = self._sm0(packed, lens)
        lo26, kidx, runlen, ne_s = self._sm1(self.ek_s, codes2, lengths2)
        codes_i = codes2.astype(jnp.int32)
        fsp, hit, tot, qleft, sel = self._sm2(
            self.fm_s, codes_i, lengths2, lo26, kidx, runlen)
        n_data = self.mesh.shape["data"]
        B2l = codes2.shape[0] // n_data
        from .fast_engine import ROWS_PER_SEARCH

        nwR = kidx.shape[2] * ROWS_PER_SEARCH
        ref_c, diag_c, vote_c = self._sm3(B2l, nwR)(
            self.fm_s, self.loc_s, lengths2, fsp, hit, tot, qleft, sel)
        W = codes2.shape[1]
        res4 = self._sm4(B2l, 2 * _band(W) + 16)(
            self.ra_s, self.ref_map, self._smw(packed), lengths2,
            ref_c, diag_c, vote_c)
        out = self._sm5(res4)
        # exist-kmer evidence for the fallback gate: a read is replayable
        # if ANY shard saw seeds — max over shards, on device, packed into
        # the single [7, Bp] result array (one D2H per chunk)
        ne = jax.jit(lambda x: x.max(axis=0))(ne_s)
        return _pack7()(out, ne)

    def _run(self, packed, lens):  # pragma: no cover - mesh is required
        raise RuntimeError("ShardedFastClassifier always runs on its mesh")

    # ------------------------------------------------------------ fallback --
    def _replay(self, reads):
        """Exact adjudication via the host sharded engine (per-shard
        bit-exact classify + global merge, parallel/shard_index.py).
        Serialized by _replay_lock (see FastClassifier._replay)."""
        with self._replay_lock:
            return self._replay_inner(reads)

    def _replay_inner(self, reads):
        from ..parallel.shard_index import ShardedEngine
        from .fast_engine import FastResult

        if self._native is None:
            eng = ShardedEngine.__new__(ShardedEngine)
            from .native import NativeClassifier

            eng.engines = [
                NativeClassifier(oi, n_threads=self._fallback_threads)
                for oi in self.ois]
            # local->GLOBAL ref numbering per shard (classify_batch maps
            # through ref_id_map before the merge qsort, so tie order uses
            # the same global IDs a monolithic run would)
            cum = np.cumsum([0] + [len(oi.ref_names) for oi in self.ois])
            eng.ref_id_map = [
                [int(g) for g in self._concat2global[cum[s]:cum[s + 1]]]
                for s in range(len(self.ois))]
            self._native = eng
        out = []
        for rr in self._native.classify_batch(reads):
            prim = next((h for h in rr.hits if h.primary == 1), None)
            if prim is None:
                out.append(FastResult(name=rr.name, ref_ID=-1, direction=0,
                                      score=0, read_len=len(rr.seq)))
            else:
                out.append(FastResult(
                    name=rr.name, ref_ID=prim.ref_ID,
                    direction=prim.direction, score=prim.sum_score,
                    read_len=len(rr.seq), pos=prim.t_st))
        return out

    # -------------------------------------------------------------- report --
    def tid_of(self, ref_ID: int) -> int:
        if ref_ID < 0:
            return 0
        parts = self.ref_names[ref_ID].split("|")
        return int(parts[1]) if len(parts) > 1 and parts[1].isdigit() else 0


def load_sharded_fast(shard_root: str, mesh=None, **kw):
    """ShardedFastClassifier from a shards.json directory
    (parallel/shard_index.build_sharded_index)."""
    import json

    from ..index.format_ref import RefFormatIndex
    from ..oracle.classify import OracleIndex
    from ..parallel.mesh import make_mesh
    from ..parallel.shard_index import MANIFEST

    with open(os.path.join(shard_root, MANIFEST)) as f:
        man = json.load(f)
    ois = [OracleIndex(RefFormatIndex(os.path.join(shard_root, sh["dir"])))
           for sh in man["shards"]]
    if mesh is None:
        mesh = make_mesh(n_index=len(ois))
    ref_ids = None
    if "ref_order" in man:  # original monolithic numbering (tie order)
        pos = {n: g for g, n in enumerate(man["ref_order"])}
        ref_ids = [[pos[n] for n in oi.ref_names] for oi in ois]
    return ShardedFastClassifier(ois, mesh, ref_ids=ref_ids, **kw)
