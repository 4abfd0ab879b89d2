"""Build the 1 Gbp rung's data: community fasta + 2-shard index.

This is the index that CANNOT be monolithic: ~1 Gbp of BWT rows exceeds
the fused-LF table's 2^29-row wall (ops/fm.py), so the genome-sharded
engine (engine/sharded_fast.py) is the only device path — the
BASELINE.json "index sharded across hosts" configuration. The two
~500 Mbp shards build in parallel OS processes
(parallel/shard_index.py:build_sharded_index), each with the bounded-RSS
chunked builder (index/build.py; counting-bucket k-mer pass per the
reference's idx_sort.c:114-194 strategy).

Usage: python tools/make_scale1g.py [target_bp]
Writes /tmp/desamba_scale1g/{ref.fa,nodes.dmp,names.dmp,shards2}; then
run tools/sharded_1g_validate.py.
"""
from __future__ import annotations

import os
import resource
import sys
import time

R = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, R)
sys.path.insert(0, os.path.join(R, "tests"))

BASE = "/tmp/desamba_scale1g"


def main():
    target = int(float(sys.argv[1])) if len(sys.argv) > 1 else 1_000_000_000

    from desamba_tpu.io.fastx import write_fasta
    from desamba_tpu.parallel.shard_index import build_sharded_index
    from scale_data import make_community

    os.makedirs(BASE, exist_ok=True)
    fa = os.path.join(BASE, "ref.fa")
    t0 = time.time()
    if not os.path.exists(fa):
        refs, (nodes, names) = make_community(
            seed=2024, n_genera=256, target_total=target)
        total = sum(len(s) for _, s in refs)
        print(f"community: {len(refs)} genomes, {total/1e6:.1f} Mbp, "
              f"gen {time.time()-t0:.1f}s", flush=True)
        write_fasta(fa, refs)
        with open(os.path.join(BASE, "nodes.dmp"), "w") as f:
            f.write(nodes)
        with open(os.path.join(BASE, "names.dmp"), "w") as f:
            f.write(names)
    t1 = time.time()
    dirs = build_sharded_index(fa, os.path.join(BASE, "shards2"),
                               n_shards=2, n_jobs=2)
    rss = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6
    print(f"2-shard build {time.time()-t1:.1f}s (driver RSS {rss:.2f} GB; "
          f"shard builds are child processes)", flush=True)
    for d in dirs:
        sz = sum(os.path.getsize(os.path.join(d, f)) for f in os.listdir(d))
        print(f"  {d}: {sz/1e9:.2f} GB", flush=True)


if __name__ == "__main__":
    main()
