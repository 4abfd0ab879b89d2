"""Deterministic synthetic genomes / reads / taxonomy for tests and goldens.

Everything is seeded so goldens committed to the repo are reproducible.
Reference names follow the `tid|NNN|acc|description` convention that
meta_analysis parses the taxon id out of (cly_mt.c:777-786).
"""
from __future__ import annotations

import numpy as np

BASES = np.frombuffer(b"ACGT", dtype=np.uint8)


def random_genome(rng: np.random.Generator, length: int, gc: float = 0.5) -> bytes:
    p_at = (1 - gc) / 2
    p_gc = gc / 2
    probs = [p_at, p_gc, p_gc, p_at]
    return BASES[rng.choice(4, size=length, p=probs)].tobytes()


def make_references(seed: int = 7, n_genomes: int = 4, length: int = 40_000):
    """Returns list of (name, seq) with tid-encoded names.

    Genomes are mosaics over a shared segment pool, so they contain intra- and
    inter-genome repeats. This creates a branching de Bruijn graph with many
    unitigs — both realistic and required by the reference builder, which
    crashes when unitig starts are so sparse that none falls in its first
    k-mer partition (latent bug at idx.c:733).
    """
    rng = np.random.default_rng(seed)
    tids = [9606, 562, 1773, 2697049, 5833, 28901][: n_genomes]
    pool = [random_genome(rng, int(rng.integers(150, 900))) for _ in range(40)]
    out = []
    for i in range(n_genomes):
        parts = []
        total = 0
        target = length + i * 1000
        while total < target:
            if rng.random() < 0.55:
                seg = pool[int(rng.integers(len(pool)))]
            else:
                seg = random_genome(rng, int(rng.integers(200, 1500)))
            parts.append(seg)
            total += len(seg)
        g = b"".join(parts)[:target]
        name = f"tid|{tids[i]}|ref|genome_{i}"
        out.append((name, g))
    return out


def mutate_read(rng: np.random.Generator, frag: np.ndarray, err: float) -> bytes:
    """Apply substitutions/insertions/deletions at total rate `err`."""
    out = []
    i = 0
    n = len(frag)
    while i < n:
        r = rng.random()
        if r < err:
            kind = rng.integers(3)
            if kind == 0:  # substitution
                out.append((frag[i] + 1 + rng.integers(3)) % 4)
                i += 1
            elif kind == 1:  # insertion
                out.append(rng.integers(4))
            else:  # deletion
                i += 1
        else:
            out.append(frag[i])
            i += 1
    return BASES[np.array(out, dtype=np.int64) % 4].tobytes() if out else b"A"


def make_reads(
    references,
    seed: int = 13,
    n_reads: int = 60,
    read_len: tuple[int, int] = (300, 3000),
    err: float = 0.1,
):
    """Simulated long reads; names encode the true source (truth for ana_tax)."""
    rng = np.random.default_rng(seed)
    code = np.full(256, 0, dtype=np.uint8)
    for j, b in enumerate(b"ACGT"):
        code[b] = j
    reads = []
    for i in range(n_reads):
        gi = int(rng.integers(len(references)))
        name, seq = references[gi]
        tid = name.split("|")[1]
        L = int(rng.integers(read_len[0], read_len[1]))
        L = min(L, len(seq) - 1)
        st = int(rng.integers(0, len(seq) - L))
        frag = code[np.frombuffer(seq[st : st + L], dtype=np.uint8)]
        rev = bool(rng.integers(2))
        if rev:
            frag = (3 - frag)[::-1]
        rseq = mutate_read(rng, frag, err)
        qual = b"I" * len(rseq)
        reads.append((f"S_{tid}.{i}", rseq, qual))
    return reads


def make_taxonomy():
    """Minimal nodes.dmp / names.dmp covering the test tids, NCBI-style rows."""
    # tid, parent, rank
    nodes = [
        (1, 1, "no rank", "root"),
        (131567, 1, "no rank", "cellular organisms"),
        (2759, 131567, "superkingdom", "Eukaryota"),
        (33208, 2759, "kingdom", "Metazoa"),
        (9606, 33208, "species", "Homo sapiens"),
        (2, 131567, "superkingdom", "Bacteria"),
        (1224, 2, "phylum", "Proteobacteria"),
        (562, 1224, "species", "Escherichia coli"),
        (201174, 2, "phylum", "Actinobacteria"),
        (1773, 201174, "species", "Mycobacterium tuberculosis"),
        (10239, 1, "superkingdom", "Viruses"),
        (2697049, 10239, "no rank", "Severe acute respiratory syndrome coronavirus 2"),
    ]
    nodes_dmp = "".join(
        f"{t}\t|\t{p}\t|\t{r}\t|\t\t|\n" for t, p, r, _ in nodes
    )
    names_dmp = "".join(
        f"{t}\t|\t{n}\t|\t\t|\tscientific name\t|\n" for t, _, _, n in nodes
    )
    return nodes_dmp, names_dmp


def write_demo(dirpath, seed=7, n_genomes=4, length=40_000, n_reads=60, **kw):
    """Write ref.fa, reads.fq, nodes.dmp, names.dmp into dirpath."""
    import os

    from desamba_tpu.io.fastx import write_fasta, write_fastq

    os.makedirs(dirpath, exist_ok=True)
    refs = make_references(seed=seed, n_genomes=n_genomes, length=length)
    write_fasta(os.path.join(dirpath, "ref.fa"), refs)
    reads = make_reads(refs, n_reads=n_reads, **kw)
    write_fastq(os.path.join(dirpath, "reads.fq"), reads)
    nodes, names = make_taxonomy()
    with open(os.path.join(dirpath, "nodes.dmp"), "w") as f:
        f.write(nodes)
    with open(os.path.join(dirpath, "names.dmp"), "w") as f:
        f.write(names)
    return refs, reads
