"""NCBI taxonomy (nodes.dmp / names.dmp) loaders.

Two variants exist in the reference with different virtual-root conventions:
  * engine variant (taxonTree_rank, cly_mt.c:590-670): loads names, roots
    tid 1 and tid 0 ("CLY_FAIL") both get parent MAX_uint32.
  * analysis-CLI variant (analysis.c:71-118): no names; tid 1's parent is
    set to 0 and rank to "root"; tid 0 gets rank "CLY_FAIL".
Both allocate max_tid + 1e6 slack (so unknown tids up to that bound parse).
"""
from __future__ import annotations

import os

import numpy as np

MAX_U32 = 0xFFFFFFFF
SLACK = 1_000_000


class Taxonomy:
    def __init__(self, max_tid: int, parent: np.ndarray, rank: list, name: list):
        self.max_tid = max_tid  # includes the +1e6 slack, like the reference
        self.parent = parent  # int64[max_tid+1], MAX_U32 where absent
        self.rank = rank  # list[str]
        self.name = name  # list[str] ('' when absent / not loaded)

    def p_tid(self, tid: int) -> int:
        return int(self.parent[tid])

    def is_ancestor_or_self(self, anc: int, tid: int) -> bool:
        p = tid
        while True:
            if p == anc:
                return True
            if p < 1 or p == MAX_U32:
                return False
            p = int(self.parent[p])


def _parse_nodes(path: str):
    tids, parents, ranks = [], [], []
    with open(path) as f:
        for line in f:
            if not line.strip():
                continue
            parts = [p for p in line.split("\t|")]
            t = int(parts[0].strip("\t"))
            p = int(parts[1].strip("\t"))
            r = parts[2].strip("\t")
            tids.append(t)
            parents.append(p)
            ranks.append(r)
    return tids, parents, ranks


def load_taxonomy_engine(dir_or_nodes: str) -> Taxonomy:
    """Engine variant (cly_mt.c:590-670): reads nodes.dmp + names.dmp from a
    directory; virtual roots for tid 1 and tid 0."""
    nodes = os.path.join(dir_or_nodes, "nodes.dmp")
    names = os.path.join(dir_or_nodes, "names.dmp")
    tids, parents, ranks = _parse_nodes(nodes)
    max_tid = (max(tids) if tids else 0) + SLACK
    parent = np.full(max_tid + 1, MAX_U32, dtype=np.int64)
    rank = [""] * (max_tid + 1)
    name = [""] * (max_tid + 1)
    for t, p, r in zip(tids, parents, ranks):
        parent[t] = p
        rank[t] = r
    parent[1] = MAX_U32
    parent[0] = MAX_U32
    rank[0] = "no rank"
    name[0] = "CLY_FAIL"
    with open(names) as f:
        for line in f:
            if not line.strip():
                continue
            parts = line.split("|")
            t = int(parts[0].strip("\t"))
            nm = parts[1].strip("\t")
            ntype = parts[3]
            if ntype.startswith("\tscien"):
                name[t] = nm[:200]
    return Taxonomy(max_tid, parent, rank, name)


def load_taxonomy_cli(nodes_path: str) -> Taxonomy:
    """Analysis-CLI variant (analysis.c:71-118)."""
    tids, parents, ranks = _parse_nodes(nodes_path)
    max_tid = (max(tids) if tids else 0) + SLACK
    parent = np.full(max_tid + 1, MAX_U32, dtype=np.int64)
    rank = [""] * (max_tid + 1)
    for t, p, r in zip(tids, parents, ranks):
        parent[t] = p
        rank[t] = r
    parent[1] = 0
    rank[1] = "root"
    rank[0] = "CLY_FAIL"
    return Taxonomy(max_tid, parent, rank, [""] * (max_tid + 1))
