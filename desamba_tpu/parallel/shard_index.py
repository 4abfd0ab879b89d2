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
from ..oracle.classify import ReadResult

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


def _build_one_shard(args):
    sub, progress = args
    from ..index.build import build_index
    from ..index.format_ref import save_ref_format

    idx = build_index(os.path.join(sub, "refs.fa"), progress=progress)
    save_ref_format(idx, sub)
    return sub


def build_sharded_index(ref_fa: str, out_dir: str, n_shards: int,
                        progress=None, n_jobs: int | None = None
                        ) -> list[str]:
    """Build n_shards reference-format sub-index dirs + a manifest.

    Shards build in PARALLEL OS processes (VERDICT r3 item 3; the
    reference builds with 16-32 threads, idx_sort.c:86-99) — the builder
    is a single-process numpy pipeline, so process-per-shard is the
    natural parallel axis. n_jobs defaults to min(n_shards, cpu count);
    n_jobs=1 falls back to in-process builds (used by tests that pass a
    progress callback, which does not pickle)."""
    records = [(r.name, r.seq) for r in read_fastx(ref_fa)]
    parts = partition_references(records, n_shards)
    os.makedirs(out_dir, exist_ok=True)
    dirs = []
    for s, idxs in enumerate(parts):
        sub = os.path.join(out_dir, f"shard{s}")
        os.makedirs(sub, exist_ok=True)
        write_fasta(os.path.join(sub, "refs.fa"),
                    [records[i] for i in idxs])
        dirs.append(sub)
    n_jobs = n_jobs or min(n_shards, os.cpu_count() or 1)
    if n_jobs > 1 and progress is None:
        import multiprocessing as mp

        with mp.get_context("spawn").Pool(n_jobs) as pool:
            pool.map(_build_one_shard, [(d, None) for d in dirs])
    else:
        for d in dirs:
            _build_one_shard((d, progress))
    with open(os.path.join(out_dir, MANIFEST), "w") as f:
        json.dump(
            dict(n_shards=n_shards,
                 # original monolithic numbering (ref_ID = fasta order,
                 # idx.c:594): consumers map shard-local refs back to it so
                 # tie order matches a monolithic run
                 ref_order=[r[0] for r in records],
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
    locally. Its pos-sort chain merge decomposes exactly — it only ever
    combines chains with the SAME ref_ID (cly.c:2913-2952) and refs are
    disjoint across shards — and its score thresholds are per-chain; the
    200/400 candidate caps (cly.c:2878-2988 head) however are GLOBAL in a
    monolithic run and per-shard here, so a read with >200 chains spread
    across shards can keep a different candidate set (residual divergence,
    alongside the seed-selection drift below). The merge then has to
    reproduce the monolithic run's final ordering:
    shard-local ref_IDs are mapped back to the ORIGINAL fasta numbering
    (the manifest's ref_order) and the union is sorted with the real glibc
    qsort under chain_cmp_by_MEM_score — including its sum_score%2 tie
    quirk (cly.c:62) — before primary/secondary/supplementary detection.

    Residual divergence from a monolithic run is upstream of the merge:
    per-shard exist filters and FM intervals change seed selection (the
    adaptive stepping of cly.c:1521-1528 sees only local genomes) and
    rescore windows past a genome end read different neighbor bases than
    the monolithic ref_bin packing. Those are bounded and characterized in
    tests/test_parallel.py.
    """

    def __init__(self, shard_root: str, n_threads: int = 1,
                 backend: str = "native"):
        from ..index.format_ref import RefFormatIndex
        from ..oracle.classify import OracleIndex

        with open(os.path.join(shard_root, MANIFEST)) as f:
            man = json.load(f)
        self.engines = []
        self.ref_id_map = []  # per shard: local ref -> global ref
        shard_names = []
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
            shard_names.append(list(oi.ref_names))
        if "ref_order" in man:  # original monolithic numbering
            names = list(man["ref_order"])
            pos = {n: g for g, n in enumerate(names)}
            self.ref_id_map = [[pos[n] for n in sn] for sn in shard_names]
        else:  # legacy manifest: shard-concatenation order
            names = []
            for sn in shard_names:
                self.ref_id_map.append(list(range(len(names),
                                                  len(names) + len(sn))))
                names.extend(sn)
        self.merged_view = _MergedIndexView(names)

    def classify_batch(self, reads) -> list[ReadResult]:
        from ..oracle.cqsort import qsort_list
        from ..oracle.rescore import (SZ_CHAIN, chain_cmp_by_mem_score,
                                      chain_cmp_by_pos, detect_primary)

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
                    c.ref_ID = self.ref_id_map[s][c.ref_ID]
                    cands.append(c)
            # the monolithic final sort (delete_small_score_rst's last
            # qsort, cly.c:2986) over the union, glibc tie semantics.
            # chain_cmp_by_mem_score's %2 tie quirk makes the glibc
            # permutation depend on the INPUT arrangement; monolithically
            # that input is in chain_cmp_by_pos order (rescore.py:580), so
            # reconstruct it first instead of sorting the shard-concat order
            if len(cands) > 1:
                # the monolithic 200/400 candidate caps applied to the
                # UNION (cly.c:2878-2988 head; VERDICT r3 item 5): each
                # shard capped only its own list, so a read with chains
                # spread over shards could keep more than a monolithic
                # run. Monolithically delete_small_score_rst sees the list
                # in chain_cmp_by_score order (the qsort at cly.c:343), so
                # the caps only ever drop the LOW-score tail; reproduce
                # that by sorting the union by the same comparator before
                # capping, then rebuild the pos order the final mem-score
                # qsort expects (rescore.py:580)
                if len(cands) > 200:
                    from ..oracle.classify import chain_cmp_by_score

                    cands = qsort_list(cands, SZ_CHAIN, chain_cmp_by_score)
                    keep = 200
                    while keep < len(cands) and cands[keep].sum_score > 50:
                        keep += 1
                    del cands[keep:]
                    del cands[400:]
                cands = qsort_list(cands, SZ_CHAIN, chain_cmp_by_pos)
                cands = qsort_list(cands, SZ_CHAIN, chain_cmp_by_mem_score)
            merged.hits = cands
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
