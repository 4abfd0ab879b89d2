"""1 Gbp rung of the scale ladder (round 5): the index that CANNOT be
monolithic.

At ~1 Gbp the BWT exceeds the fused-LF table's 2^29-row wall
(ops/fm.py), so the genome-sharded engine is the only device path — which
is exactly the configuration BASELINE.json's "index sharded across hosts"
names. This validates it end to end on an 8-virtual-CPU-device
('data','index') mesh: ShardedFastClassifier over 2 x ~500 Mbp shards,
exact_fallback on, vs (a) read-name truth tids for all reads and (b) the
bit-exact host ShardedEngine (per-shard native classify + global merge)
on a subset.

Usage: python tools/sharded_1g_validate.py [n_reads] [n_native]
       python tools/sharded_1g_validate.py native [n_native]
Needs /tmp/desamba_scale1g/{ref.fa,shards2} (tools/make_scale1g.py builds
them). The device leg dumps its calls to device_calls.json as soon as it
finishes (the sharded init over 2 x ~500 Mbp shards is ~25 min of FM-table
construction on this host, too expensive to repeat); `native` resumes from
that dump, runs the bit-exact host ShardedEngine leg only, and writes
SHARDED_r05_1G.json.
"""
from __future__ import annotations

import json
import os
import sys
import time

R = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, R)
sys.path.insert(0, os.path.join(R, "tests"))

BASE = "/tmp/desamba_scale1g"


def truth_tid(name: str) -> int:
    return int(name.split("_")[1].split(".")[0])


DUMP = os.path.join(BASE, "device_calls.json")


def phase_native(n_native):
    """Host ShardedEngine leg, resumed from the device leg's dump."""
    from desamba_tpu.parallel.shard_index import ShardedEngine

    with open(DUMP) as f:
        dev = json.load(f)
    n_native = min(n_native, dev["n_reads"])
    from desamba_tpu.io.fastx import read_fastx
    from scale_data import make_reads_vec

    refs = [(r.name, r.seq) for r in read_fastx(os.path.join(BASE, "ref.fa"))]
    reads = make_reads_vec(refs, seed=424242, n_reads=dev["n_reads"],
                           read_len=(1_000, 3_000), err=0.10)
    sub = reads[:n_native]
    t0 = time.time()
    eng = ShardedEngine(os.path.join(BASE, "shards2"), n_threads=2)
    nres = eng.classify_batch(sub)
    dtn = time.time() - t0
    tid_by_gid = dict(dev["tid_by_gid"])
    tid_by_gid = {int(k): v for k, v in tid_by_gid.items()}

    def host_tid(rr):
        prim = next((h for h in rr.hits if h.primary == 1), None)
        if prim is None:
            return 0
        return tid_by_gid.get(prim.ref_ID, 0)

    ntids = [host_tid(r) for r in nres]
    truth = dev["truth"][:n_native]
    tids = dev["tids"][:n_native]
    agree = sum(a == b for a, b in zip(tids, ntids))
    nacc = sum(a == t for a, t in zip(ntids, truth)) / n_native
    print(f"host sharded engine: {n_native} reads in {dtn:.1f}s; "
          f"device-vs-host agreement {agree}/{n_native} = "
          f"{agree/n_native:.4f}; host truth acc {nacc:.4f}", flush=True)

    art = os.path.join(R, "SHARDED_r05_1G.json")
    with open(art, "w") as f:
        json.dump(dict(
            scale_bp=dev["scale_bp"], n_shards=dev["n_shards"],
            shard_rows=dev["shard_rows"],
            monolithic_possible=False,
            why="total BWT rows exceed the 2^29 fused-LF wall (ops/fm.py)",
            n_reads=dev["n_reads"], read_len="1000-3000", err=0.10,
            exact_fallback=True, amb_margin=dev["amb_margin"],
            mesh=dev["mesh"],
            truth_accuracy_sharded=dev["truth_accuracy_sharded"],
            fallback=dev["fallback"],
            cpu_mesh_rps=dev["cpu_mesh_rps"],
            sharded_init_s=dev["sharded_init_s"],
            n_native=n_native,
            host_engine_s=round(dtn, 1),
            agreement_vs_host_sharded=round(agree / n_native, 4),
            truth_accuracy_host=round(nacc, 4)), f, indent=1)
    print(f"artifact -> {art}", flush=True)


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "native":
        phase_native(int(sys.argv[2]) if len(sys.argv) > 2 else 256)
        return
    n_reads = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    n_native = int(sys.argv[2]) if len(sys.argv) > 2 else 256

    import jax

    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass

    from desamba_tpu.engine.sharded_fast import load_sharded_fast
    from desamba_tpu.io.fastx import read_fastx
    from desamba_tpu.parallel import make_mesh
    from scale_data import make_reads_vec

    refs = [(r.name, r.seq) for r in read_fastx(os.path.join(BASE, "ref.fa"))]
    total_bp = sum(len(s) for _, s in refs)
    reads = make_reads_vec(refs, seed=424242, n_reads=n_reads,
                           read_len=(1_000, 3_000), err=0.10)
    n_dev = len(jax.devices())
    mesh = make_mesh(n_data=n_dev // 2, n_index=2)
    t0 = time.time()
    cl = load_sharded_fast(os.path.join(BASE, "shards2"), mesh=mesh,
                           exact_fallback=True)
    init_s = time.time() - t0
    print(f"sharded init {init_s:.0f}s; total {total_bp/1e6:.0f} "
          f"Mbp over {len(cl.ois)} shards "
          f"(L = {[int(oi.L) for oi in cl.ois]}), amb_margin "
          f"{cl.amb_margin}", flush=True)
    t0 = time.time()
    cl.classify_batch(reads[:256])
    print(f"warm (incl. compiles) {time.time()-t0:.0f}s", flush=True)
    cl.stats = dict(n_reads=0, n_fallback=0)
    t0 = time.time()
    res = cl.classify_batch(reads)
    dt = time.time() - t0
    tids = [cl.tid_of(r.ref_ID) for r in res]
    truth = [truth_tid(r[0]) for r in reads]
    acc = sum(a == t for a, t in zip(tids, truth)) / n_reads
    frac = cl.stats["n_fallback"] / max(1, cl.stats["n_reads"])
    print(f"{n_reads} reads in {dt:.1f}s = {n_reads/dt:.1f} reads/s "
          f"(CPU mesh), fallback {frac:.3f}, truth acc {acc:.4f}",
          flush=True)

    # persist the device leg immediately — the sharded init is too
    # expensive to repeat if the host leg dies (learned the hard way)
    n_gids = len(cl.ref_names) if hasattr(cl, "ref_names") else \
        sum(len(oi.ref_names) for oi in cl.ois)
    with open(DUMP, "w") as f:
        json.dump(dict(
            scale_bp=total_bp, n_shards=len(cl.ois),
            shard_rows=[int(oi.L) for oi in cl.ois],
            n_reads=n_reads, amb_margin=int(cl.amb_margin),
            mesh={k: int(v) for k, v in mesh.shape.items()},
            truth_accuracy_sharded=round(acc, 4),
            fallback=round(frac, 4),
            cpu_mesh_rps=round(n_reads / dt, 1),
            sharded_init_s=round(init_s, 1),
            tids=tids, truth=truth,
            tid_by_gid={g: int(cl.tid_of(g)) for g in range(n_gids)}),
            f)
    print(f"device calls -> {DUMP}", flush=True)

    # bit-exact host sharded engine on a subset + artifact
    phase_native(n_native)


if __name__ == "__main__":
    main()
