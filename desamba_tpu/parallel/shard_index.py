"""Index sharding: per-shard sub-indexes over genome subsets + merged classify.

The reference index is a single monolithic in-RAM structure (DA_IDX,
idx.h:83-110). When the reference set exceeds one chip's HBM, the TPU-native
deployment shards by *genome*: each index shard is a complete self-contained
index (FM, SA, exist-filter, unitigs, REF_POS) over a subset of the reference
sequences. A read is classified against every shard; per-shard candidate
chains are merged by score and primary/secondary structure is recomputed
globally (detect_primary, cly.c:2990-3053) before SAM emission. This is the
"sharded index across hosts" configuration of BASELINE.json: the candidate
merge is the all_gather of SURVEY.md section 2.3(a) (device-side analog in
parallel/collectives.py; this module is the host/runtime implementation the
engine serves requests through).
"""
from __future__ import annotations

import json
import os

from ..io.fastx import read_fastx, write_fasta
from ..oracle.classify import ReadResult, u32

MANIFEST = "shards.json"


def partition_references(records, n_shards: int):
    """Greedy size-balanced partition of (name, seq) records into shards.

    Deterministic: records sorted by (descending length, name) then assigned
    to the lightest shard."""
    order = sorted(range(len(records)),
                   key=lambda i: (-len(records[i][1]), records[i][0]))
    loads = [0] * n_shards
    shards = [[] for _ in range(n_shards)]
    for i in order:
        s = loads.index(min(loads))
        shards[s].append(i)
        loads[s] += len(records[i][1])
    # keep original order within a shard (stable ref_ID semantics)
    return [sorted(s) for s in shards]


def build_sharded_index(ref_fa: str, out_dir: str, n_shards: int,
                        progress=None) -> list[str]:
    """Build n_shards reference-format sub-index dirs + a manifest."""
    from ..index.build import build_index
    from ..index.format_ref import save_ref_format

    records = [(r.name, r.seq) for r in read_fastx(ref_fa)]
    parts = partition_references(records, n_shards)
    os.makedirs(out_dir, exist_ok=True)
    dirs = []
    for s, idxs in enumerate(parts):
        sub = os.path.join(out_dir, f"shard{s}")
        fa = os.path.join(sub, "refs.fa")
        os.makedirs(sub, exist_ok=True)
        write_fasta(fa, [records[i] for i in idxs])
        idx = build_index(fa, progress=progress)
        save_ref_format(idx, sub)
        dirs.append(sub)
    with open(os.path.join(out_dir, MANIFEST), "w") as f:
        json.dump(
            dict(n_shards=n_shards,
                 shards=[dict(dir=f"shard{s}",
                              refs=[records[i][0] for i in parts[s]])
                         for s in range(n_shards)]),
            f, indent=1)
    return dirs


class _MergedIndexView:
    """ref_names view over concatenated shards (for the SAM formatter)."""

    def __init__(self, ref_names):
        self.ref_names = ref_names


class ShardedEngine:
    """Classify against every shard, merge candidates, re-detect primaries.

    Per-shard filtering (delete_small_score_rst, cly.c:2878-2988) runs
    locally — same thresholds as a monolithic run; the merge concatenates
    surviving chains in descending sum_score (stable across shards in shard
    order) and recomputes primary/secondary/supplementary globally.
    """

    def __init__(self, shard_root: str, n_threads: int = 1,
                 backend: str = "native"):
        from ..index.format_ref import RefFormatIndex
        from ..oracle.classify import OracleIndex

        with open(os.path.join(shard_root, MANIFEST)) as f:
            man = json.load(f)
        self.engines = []
        self.ref_name_offset = []
        names = []
        for sh in man["shards"]:
            d = os.path.join(shard_root, sh["dir"])
            oi = OracleIndex(RefFormatIndex(d))
            if backend == "native":
                from ..engine.native import NativeClassifier

                eng = NativeClassifier(oi, n_threads=n_threads)
            else:
                from ..oracle.driver import OracleClassifier

                eng = OracleClassifier(oi)
            self.engines.append(eng)
            self.ref_name_offset.append(len(names))
            names.extend(oi.ref_names)
        self.merged_view = _MergedIndexView(names)

    def classify_batch(self, reads) -> list[ReadResult]:
        from ..oracle.rescore import detect_primary

        reads = list(reads)
        per_shard = []
        for eng in self.engines:
            if hasattr(eng, "classify_batch"):
                per_shard.append(eng.classify_batch(reads))
            else:
                per_shard.append(
                    [eng.classify_read(*r) for r in reads])
        out = []
        for i, (name, seq, qual) in enumerate(reads):
            merged = ReadResult(name=name, seq=seq, qual=qual or b"")
            cands = []
            for s, res_list in enumerate(per_shard):
                r = res_list[i]
                if getattr(r, "aborted", False):
                    merged.aborted = True
                for c in r.hits:
                    c.ref_ID += self.ref_name_offset[s]
                    cands.append((s, c))
            # stable merge: descending sum_score, ties in shard order then
            # per-shard (already reference-sorted) order
            cands.sort(key=lambda sc: -u32(sc[1].sum_score))
            merged.hits = [c for _, c in cands]
            detect_primary(merged.hits, len(seq))
            out.append(merged)
        return out

    def classify_to_sam(self, reads, output_seq: bool = False,
                        max_sec_n: int = 5) -> str:
        from ..oracle.driver import format_sam

        out = []
        for r in self.classify_batch(reads):
            if getattr(r, "aborted", False):
                continue
            out.append(format_sam(self.merged_view, r, output_seq, max_sec_n))
        return "".join(out)
