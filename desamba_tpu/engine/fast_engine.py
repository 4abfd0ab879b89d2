"""Fully device-resident batched classifier ("fast mode").

The north-star pipeline (BASELINE.json) as three device dispatches per
read batch — results stay on device between stages; no host sync:

  stage1  exist-filter probe + per-window top-seed selection
          (cly.c:1066-1155 / cly.c:1157-1229 analogs; ops/ekmer.py,
          ops/seeds.py)
  stage2  lockstep FM backward search from the 13-base hash head start +
          per-row walk extensions (cly.c:1383-1442 analog; ops/fm.py)
  stage3  SA-sample resolution, unitig->reference mapping (cly.c:466-491
          analog; ops/locate.py) and a diagonal-bucket Hough vote that
          replaces host chaining (cly.c:200-322 analog): every anchor
          adds its match length to a (ref_ID, diagonal/128) bucket; the
          winning bucket per read is the classification.

The three-way split is deliberate: fusing the whole pipeline into ONE jit
sends XLA:TPU's scheduler into a pathological fusion (compile minutes,
runtime 100x slower); as three programs each compiles in seconds and the
batch runs in milliseconds.

Unlike engine/tpu_engine.py (bit-exact hybrid, host replay), this path
trades byte-identical SAM for throughput: results carry (ref, direction,
approx position, vote score) per read and are validated by agreement with
the reference's primary assignments (tests/test_fast_engine.py). This is
the deployment path for abundance workloads where the taxonomic call, not
the SAM record, is the product.
"""
from __future__ import annotations

import os
from dataclasses import dataclass
from functools import partial

import numpy as np

from ..constants import SEED_RANGE


def _pow2(n: int, lo: int = 64) -> int:
    v = lo
    while v < n:
        v <<= 1
    return v


N_BUCKETS = 128  # diagonal-vote buckets per read-direction
DIAG_SHIFT = 7   # 128 bp diagonal tolerance (chain gap < 400, cly.c:212)
ROWS_PER_SEARCH = 2  # MEM_SEARCH_FAST (cly.c:1471)
FM_EXT_CAP = 48  # cap the lockstep interval search depth; per-row walks
                 # (fixed 96-step scan) carry matches further — bounds the
                 # while-loop straggler cost of one long-matching lane


def _enable_compile_cache():
    """Persistent XLA compile cache so each (W, B) bucket compiles once
    per machine, not once per process."""
    import jax

    d = os.path.expanduser("~/.cache/desamba_tpu_xla")
    os.makedirs(d, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", d)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass  # older jax: cache simply not persisted


def _build_stages(lek: int, sbm: int, mask_bits: int, min_match: int):
    """Returns (stage1, stage2, stage3) closed over static ek params.

    Each stage is a separately jit-able function; chaining them keeps all
    intermediates on device. stage3 takes B2 statically (strand split).
    """
    import jax
    import jax.numpy as jnp

    from ..ops.ekmer import _probe_reads, kmer_lo26
    from ..ops.fm import interval_search, row_walks
    from ..ops.locate import expand_refpos, resolve_rows
    from ..ops.seeds import top_seeds

    def stage1(w0, w1, codes2, lengths2):
        """codes2: uint8[2B, W] (rows 0..B-1 fwd, B..2B-1 rc)."""
        ex = _probe_reads(w0, w1, codes2, lengths2, lek, sbm, mask_bits)
        lo26 = kmer_lo26(codes2, lek)
        kidx, runlen = top_seeds(ex, SEED_RANGE)  # [2B, n_win]
        n_exist = ex.sum(axis=1).astype(jnp.int32)
        return lo26, kidx, runlen, n_exist

    def stage2(fm, codes_i, lengths2, lo26, kidx, runlen):
        B2, W = codes_i.shape
        n_win = kidx.shape[1]
        S = B2 * n_win
        lane = jnp.repeat(jnp.arange(B2, dtype=jnp.int32), n_win)
        sk = kidx.reshape(S)
        rl = runlen.reshape(S)
        s_idx = sk + (lek - 1)
        seed_ok = (rl > 0) & (s_idx < lengths2[lane])
        pre = lo26[lane, sk]
        sp0 = jnp.where(seed_ok, fm.hash13[pre], 0)
        ep0 = jnp.where(seed_ok, fm.hash13[pre + 1], 0)
        res = interval_search(
            fm, codes_i, 0, s_idx, sp0, ep0,
            jnp.full(S, ROWS_PER_SEARCH, jnp.int32),
            jnp.full(S, min_match, jnp.int32),
            jnp.minimum(s_idx, 13 + FM_EXT_CAP), lanes=lane,
        )
        ml0 = res["match_len"]  # chars matched before the break char
        # status 1 (depth cap / read start reached) is a hit here too —
        # the per-row walk below keeps extending from the recorded interval
        srch_ok = seed_ok & (res["sp"] < res["ep"])
        # per-row single-interval extension (bwt_single_search analog)
        R = ROWS_PER_SEARCH
        rowk = jnp.arange(R, dtype=jnp.int32)
        rows = (res["sp"][:, None] + rowk[None, :]).reshape(-1)
        rvalid = (srch_ok[:, None] & (
            res["sp"][:, None] + rowk[None, :] < res["ep"][:, None])
        ).reshape(-1)
        lane_r = jnp.repeat(lane, R)
        ptr_r = jnp.repeat(res["ptr"], R)
        rem_r = jnp.repeat(jnp.maximum(s_idx - ml0, 0), R)
        wr = row_walks(fm, codes_i, rows, ptr_r,
                       jnp.where(rvalid, rem_r, 0),
                       lanes=lane_r, with_trace=False)
        total = jnp.repeat(ml0, R) + 1 + wr["steps"]  # full match length
        hit_r = rvalid & (total >= min_match) & ~wr["bad_char"]
        s_idx_r = jnp.repeat(s_idx, R)
        return wr["final_sp"], hit_r, total, lane_r, s_idx_r

    def stage3(fm, loc, final_sp, hit_r, total, lane_r, s_idx_r, B2: int):
        loc_r = resolve_rows(fm, loc, final_sp, hit_r)
        ref, gpos, pvalid = expand_refpos(
            loc, loc_r["uni"], loc_r["u_off"], loc_r["ok"])  # [S*R, P]
        P = ref.shape[1]
        # per-anchor vote: weight = matched length, diag = g - read_leftmost
        lane_a = jnp.repeat(lane_r, P).reshape(-1)
        w_a = jnp.repeat(total, P).reshape(-1)
        qleft = jnp.repeat(s_idx_r - total + 1, P)
        diag = (gpos.reshape(-1) - qleft) >> DIAG_SHIFT
        ref_f = ref.reshape(-1)
        ok_a = pvalid.reshape(-1)
        key = ((ref_f.astype(jnp.uint32) * jnp.uint32(2654435761)) ^
               (diag.astype(jnp.uint32) * jnp.uint32(40503))) % jnp.uint32(
                   N_BUCKETS)
        key = key.astype(jnp.int32)
        w_a = jnp.where(ok_a, w_a, 0)
        vsum = jnp.zeros((B2, N_BUCKETS), jnp.int32).at[
            lane_a, key].add(w_a)
        packed = jnp.where(ok_a, w_a * 65536 + jnp.clip(ref_f, 0, 65535), -1)
        vbest = jnp.full((B2, N_BUCKETS), -1, jnp.int32).at[
            lane_a, key].max(packed)
        # winning bucket per direction-row
        bb = jnp.argmax(vsum, axis=1)
        rows_i = jnp.arange(B2, dtype=jnp.int32)
        score2 = vsum[rows_i, bb]
        ref2 = jnp.where(vbest[rows_i, bb] >= 0,
                         vbest[rows_i, bb] % 65536, -1)
        # combine the two strands of each read
        B = B2 // 2
        sc_f, sc_r = score2[:B], score2[B:]
        rf_f, rf_r = ref2[:B], ref2[B:]
        use_r = sc_r > sc_f
        return dict(
            score=jnp.where(use_r, sc_r, sc_f),
            ref=jnp.where(use_r, rf_r, rf_f),
            direction=jnp.where(use_r, 0, 1),  # 1 = forward (cly.h FORWARD)
        )

    return stage1, stage2, stage3


@dataclass
class FastResult:
    name: str
    ref_ID: int      # -1 = unclassified
    direction: int
    score: int
    read_len: int


class FastClassifier:
    """Resident-index batched TPU classifier (throughput mode).

    min_score gates classification like the reference's final filter
    (delete_small_score_rst thresholds, cly.c:2955-2981) but on vote mass.
    """

    def __init__(self, oi, min_score: int = 30, mesh=None):
        _enable_compile_cache()
        import jax

        from ..index.tensor_index import from_oracle_index
        from ..ops.ekmer import EkArrays
        from ..ops.fm import FmArrays
        from ..ops.locate import LocArrays

        self.oi = oi
        ti = from_oracle_index(oi)
        self.fm = FmArrays(ti)
        self.ek = EkArrays(ti)
        self.loc = LocArrays(ti)
        self.min_score = min_score
        s1, s2, s3 = _build_stages(
            self.ek.lek, self.ek.single_base_max, self.ek.mask_bits,
            min_match=20)
        self._s1 = jax.jit(s1)
        self._s2 = jax.jit(s2)
        self._s3 = jax.jit(s3, static_argnames=("B2",))
        self._code = np.full(256, 1, np.uint8)
        for j, b in enumerate(b"ACGT"):
            self._code[b] = j
        for j, b in enumerate(b"acgt"):
            self._code[b] = j
        self.mesh = mesh
        if mesh is not None:
            self._shard_stages(mesh)

    def _run(self, codes2, lengths2):
        """Single-device 3-dispatch pipeline; intermediates stay on device."""
        import jax.numpy as jnp

        codes2 = jnp.asarray(codes2)
        lengths2 = jnp.asarray(lengths2)
        lo26, kidx, runlen, n_exist = self._s1(
            self.ek.w0, self.ek.w1, codes2, lengths2)
        codes_i = codes2.astype(jnp.int32)
        fsp, hit, tot, lane_r, s_idx_r = self._s2(
            self.fm, codes_i, lengths2, lo26, kidx, runlen)
        out = self._s3(self.fm, self.loc, fsp, hit, tot, lane_r, s_idx_r,
                       B2=codes2.shape[0])
        B = codes2.shape[0] // 2
        out["n_exist"] = n_exist[:B] + n_exist[B:]
        return out

    def _shard_stages(self, mesh):
        """Data-parallel variant: reads sharded over 'data', index
        replicated (SURVEY.md section 2.2). Each stage is its own
        jit(shard_map(...)); per-shard rows carry [fwd_i; rc_i] pairs so
        the strand split at local B2//2 stays shard-local."""
        import jax
        from jax import shard_map
        from jax.sharding import NamedSharding, PartitionSpec as P

        s1, s2, s3 = _build_stages(self.ek.lek, self.ek.single_base_max,
                                   self.ek.mask_bits, min_match=20)
        fm_specs = jax.tree_util.tree_map(lambda _: P(), self.fm)
        loc_specs = jax.tree_util.tree_map(lambda _: P(), self.loc)
        self._sm1 = jax.jit(shard_map(
            s1, mesh=mesh, in_specs=(P(), P(), P("data"), P("data")),
            out_specs=(P("data"), P("data"), P("data"), P("data")),
            check_vma=False))
        self._sm2 = jax.jit(shard_map(
            s2, mesh=mesh,
            in_specs=(fm_specs, P("data"), P("data"), P("data"), P("data"),
                      P("data")),
            out_specs=(P("data"), P("data"), P("data"), P("data"),
                       P("data")),
            check_vma=False))

        sm3_cache: dict[int, object] = {}

        def sm3(B2l: int):
            if B2l not in sm3_cache:
                sm3_cache[B2l] = jax.jit(shard_map(
                    partial(s3, B2=B2l), mesh=mesh,
                    in_specs=(fm_specs, loc_specs, P("data"), P("data"),
                              P("data"), P("data"), P("data")),
                    out_specs=dict(score=P("data"), ref=P("data"),
                                   direction=P("data")),
                    check_vma=False))
            return sm3_cache[B2l]

        self._sm3 = sm3
        self._smesh = mesh
        repl = NamedSharding(mesh, P())
        self._fm_r = jax.tree_util.tree_map(
            partial(jax.device_put, device=repl), self.fm)
        self._loc_r = jax.tree_util.tree_map(
            partial(jax.device_put, device=repl), self.loc)
        self._w0_r = jax.device_put(self.ek.w0, repl)
        self._w1_r = jax.device_put(self.ek.w1, repl)

    def _run_mesh(self, codes2, lengths2):
        import jax
        import jax.numpy as jnp
        from jax.sharding import NamedSharding, PartitionSpec as P

        data = NamedSharding(self.mesh, P("data"))
        codes2 = jax.device_put(codes2, data)
        lengths2 = jax.device_put(lengths2, data)
        lo26, kidx, runlen, n_exist = self._sm1(
            self._w0_r, self._w1_r, codes2, lengths2)
        codes_i = codes2.astype(jnp.int32)
        fsp, hit, tot, lane_r, s_idx_r = self._sm2(
            self._fm_r, codes_i, lengths2, lo26, kidx, runlen)
        n_data = self.mesh.shape["data"]
        B2l = codes2.shape[0] // n_data
        out = self._sm3(B2l)(self._fm_r, self._loc_r, fsp, hit, tot,
                             lane_r, s_idx_r)
        return out, np.asarray(n_exist)

    # ------------------------------------------------------------ encode --
    def _encode(self, reads):
        """Encode into shape buckets (pow2 width AND row count) so batches
        of any size reuse one compiled pipeline per bucket."""
        lens = np.array([len(r[1]) for r in reads], np.int32)
        W = _pow2(max(int(lens.max()), self.ek.lek + 2), 256)
        B = len(reads)
        Bp = _pow2(B, 8)
        codes2 = np.zeros((2 * Bp, W), np.uint8)
        for i, (_, seq, _) in enumerate(reads):
            f = self._code[np.frombuffer(seq, np.uint8)]
            codes2[i, : f.size] = f
            codes2[Bp + i, : f.size] = (3 - f)[::-1]
        lengths2 = np.zeros(2 * Bp, np.int32)
        lengths2[:B] = lens
        lengths2[Bp : Bp + B] = lens
        return codes2, lengths2, lens

    # ----------------------------------------------------------- classify --
    def classify_batch(self, reads, block: int = 512) -> list[FastResult]:
        out = []
        for s0 in range(0, len(reads), block):
            out.extend(self._classify_chunk(reads[s0 : s0 + block]))
        return out

    def _classify_chunk(self, reads):
        codes2, lengths2, lens = self._encode(reads)
        B = len(reads)
        Bp = codes2.shape[0] // 2
        if self.mesh is not None:
            n_data = self.mesh.shape["data"]
            assert Bp % n_data == 0, "pow2 bucket must divide mesh size"
            # interleave so both strands of a read land on one shard:
            # shard k gets reads [k*Bp/n .. (k+1)*Bp/n) fwd then their rc
            per = Bp // n_data
            order = []
            for k in range(n_data):
                order.extend(range(k * per, (k + 1) * per))
                order.extend(range(Bp + k * per, Bp + (k + 1) * per))
            order = np.array(order)
            res, _ = self._run_mesh(codes2[order], lengths2[order])
            # each shard emits its local B2//2 = per read results, in
            # shard order == original read order
            res = {k: np.asarray(v)[:B] for k, v in res.items()}
        else:
            res = self._run(codes2, lengths2)
            res = {k: np.asarray(v)[:B] for k, v in res.items()}
        out = []
        for i, (name, seq, qual) in enumerate(reads):
            sc = int(res["score"][i])
            rid = int(res["ref"][i])
            ok = sc >= self.min_score and rid >= 0
            out.append(FastResult(
                name=name, ref_ID=rid if ok else -1,
                direction=int(res["direction"][i]) if ok else 0,
                score=sc, read_len=int(lens[i])))
        return out

    # ------------------------------------------------------------- report --
    def tid_of(self, ref_ID: int) -> int:
        """tid from the 'tid|NNN|...' reference naming convention
        (cly_mt.c:777-786)."""
        if ref_ID < 0:
            return 0
        parts = self.oi.ref_names[ref_ID].split("|")
        return int(parts[1]) if len(parts) > 1 and parts[1].isdigit() else 0
