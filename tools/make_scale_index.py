"""Build the realistic-scale community index (VERDICT r3 item 1).

Generates a ~SCALE_BP synthetic metagenome (tests/scale_data.py: genera
with shared cores, 99%-identity strain pairs, mobile elements, rRNA
operons), writes FASTA + taxonomy, builds the index with
desamba_tpu.index.build, and saves the reference 10-file format.

Usage: python tools/make_scale_index.py [out_dir] [target_bp]
Prints build wall time and peak RSS.
"""
from __future__ import annotations

import os
import resource
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "tests"))


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/desamba_scale"
    target = int(float(sys.argv[2])) if len(sys.argv) > 2 else 100_000_000

    from desamba_tpu.index.build import build_index
    from desamba_tpu.index.format_ref import save_ref_format
    from desamba_tpu.io.fastx import write_fasta
    from scale_data import make_community

    os.makedirs(out, exist_ok=True)
    fa = os.path.join(out, "ref.fa")
    idx_dir = os.path.join(out, "idx")

    t0 = time.time()
    if not os.path.exists(fa):
        refs, (nodes, names) = make_community(
            seed=2024, n_genera=64, target_total=target)
        total = sum(len(s) for _, s in refs)
        print(f"community: {len(refs)} genomes, {total/1e6:.1f} Mbp, "
              f"gen {time.time()-t0:.1f}s", flush=True)
        write_fasta(fa, refs)
        with open(os.path.join(out, "nodes.dmp"), "w") as f:
            f.write(nodes)
        with open(os.path.join(out, "names.dmp"), "w") as f:
            f.write(names)
    t1 = time.time()
    idx = build_index(fa)
    t2 = time.time()
    save_ref_format(idx, idx_dir)
    t3 = time.time()
    rss = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6  # GB
    print(f"build {t2-t1:.1f}s, save {t3-t2:.1f}s, peak RSS {rss:.2f} GB",
          flush=True)
    sz = sum(os.path.getsize(os.path.join(idx_dir, f))
             for f in os.listdir(idx_dir))
    print(f"index dir {sz/1e9:.2f} GB at {idx_dir}", flush=True)


if __name__ == "__main__":
    main()
