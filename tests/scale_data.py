"""Realistic-scale synthetic metagenome generator (VERDICT r3 item 1).

The round-3 evidence base was 3-4 genomes x 30-60 kb of mosaic toy data;
the reference's raison d'etre is multi-hundred-genome, multi-100 Mbp
indexes (Jellyfish cap 12e9 kmers, /root/reference/build-index:77-80).
This module generates a community with the structure that actually
stresses the classifier, at 100 Mbp+ scale in seconds (all numpy):

  - genera: species within a genus share a mutated copy of a common
    ancestor "core" (85-95% identity) — inter-genome homology
  - strain pairs: some species carry a sibling strain at 99-99.5%
    identity under a DIFFERENT tid — the hard near-tie case the device
    pipeline's N_CAND / AMB_MARGIN machinery must adjudicate
  - a global mobile-element pool (IS elements / transposons, 0.5-5 kb)
    inserted many times within and across genomes — repeats that load
    REFPOS_PER_ANCHOR and the diagonal vote
  - an rRNA-like operon (~5 kb) present in every genome at ~97%
    identity — the classic universally-conserved cross-genome repeat
  - random species-private sequence as the background

Everything is seeded/deterministic. Names follow the `tid|NNN|...`
convention (cly_mt.c:777-786); tids are synthetic and come with a
matching nodes.dmp/names.dmp tree (root -> domain -> genus -> species).
"""
from __future__ import annotations

import numpy as np

BASES = np.frombuffer(b"ACGT", dtype=np.uint8)


def _rand_codes(rng, n: int) -> np.ndarray:
    return rng.integers(0, 4, size=n, dtype=np.uint8)


def mutate_codes(rng, codes: np.ndarray, sub: float, indel: float = 0.0
                 ) -> np.ndarray:
    """Vectorized substitutions + indels on a 2-bit code array."""
    n = codes.size
    if n == 0:
        return codes
    out = codes
    if indel > 0:
        r = rng.random(n)
        rep = np.ones(n, dtype=np.int64)
        rep[r < indel / 2] = 0                       # deletion
        rep[(r >= indel / 2) & (r < indel)] = 2      # insertion
        ins_mask_src = rep == 2
        out = np.repeat(out, rep)
        # positions that are the SECOND copy of an insertion get random bases
        pos_in_out = np.cumsum(rep) - 1              # last out-index per src
        ins_pos = pos_in_out[ins_mask_src]           # the inserted copy
        out[ins_pos] = _rand_codes(rng, ins_pos.size)
        n = out.size
    if sub > 0 and n:
        m = rng.random(n) < sub
        k = int(m.sum())
        if k:
            out = out.copy() if out is codes else out
            out[m] = (out[m] + rng.integers(1, 4, size=k, dtype=np.uint8)) % 4
    return out


def codes_to_seq(codes: np.ndarray) -> bytes:
    return BASES[codes].tobytes()


def make_community(seed: int = 2024, n_genera: int = 24,
                   species_per_genus: tuple = (2, 8),
                   genome_len: tuple = (400_000, 2_500_000),
                   strain_frac: float = 0.25,
                   target_total: int | None = None):
    """Returns (refs, taxonomy) where refs = [(name, seq_bytes)] and
    taxonomy = (nodes_dmp_text, names_dmp_text).

    target_total (bp) stops adding species once reached."""
    rng = np.random.default_rng(seed)
    # shared sequence pools -------------------------------------------------
    n_mobile = 160
    mobile = [_rand_codes(rng, int(rng.integers(500, 5_000)))
              for _ in range(n_mobile)]
    rrna = _rand_codes(rng, 5_000)

    refs = []
    nodes = [(1, 1, "no rank", "root"),
             (131567, 1, "no rank", "cellular organisms"),
             (2, 131567, "superkingdom", "Bacteria")]
    next_tid = 100_000
    total = 0
    done = False
    for g in range(n_genera):
        if done:
            break
        genus_tid = next_tid
        next_tid += 1
        nodes.append((genus_tid, 2, "genus", f"Genus_{g}"))
        n_sp = int(rng.integers(*species_per_genus))
        # genus core: ancestor chunks each species remixes (synteny breaks)
        core_len = int(rng.integers(150_000, 600_000))
        core = _rand_codes(rng, core_len)
        for s in range(n_sp):
            if done:
                break
            glen = int(np.exp(rng.uniform(np.log(genome_len[0]),
                                          np.log(genome_len[1]))))
            parts = []
            # species copy of the genus core at 85-95% identity
            div = rng.uniform(0.05, 0.15)
            parts.append(mutate_codes(rng, core, sub=div, indel=div / 8))
            # rRNA operon at ~97% identity, 2-7 copies
            rr = mutate_codes(rng, rrna, sub=0.03, indel=0.003)
            n_rr = int(rng.integers(2, 8))
            # species-private background in segments, with mobile elements
            priv_needed = max(glen - core_len - n_rr * rrna.size, 50_000)
            while priv_needed > 0:
                seg = _rand_codes(rng, int(rng.integers(20_000, 80_000)))
                parts.append(seg)
                priv_needed -= seg.size
                if rng.random() < 0.7:  # drop in a mobile element copy
                    el = mobile[int(rng.integers(n_mobile))]
                    parts.append(mutate_codes(rng, el, sub=0.01))
            for _ in range(n_rr):
                parts.insert(int(rng.integers(1, len(parts) + 1)), rr)
            genome = np.concatenate(parts)
            variants = [("", genome)]
            if rng.random() < strain_frac:
                # sibling strain: 99-99.5% identity, OWN tid
                d = rng.uniform(0.005, 0.01)
                variants.append(
                    ("s2", mutate_codes(rng, genome, sub=d, indel=d / 10)))
            for suffix, gcodes in variants:
                tid = next_tid
                next_tid += 1
                sp_name = f"Genus_{g} species_{s}{suffix or ''}"
                nodes.append((tid, genus_tid, "species", sp_name))
                name = f"tid|{tid}|ref|G{g}_S{s}{suffix}"
                refs.append((name, codes_to_seq(gcodes)))
                total += gcodes.size
                if target_total and total >= target_total:
                    done = True
                    break
    nodes_dmp = "".join(f"{t}\t|\t{p}\t|\t{r}\t|\t\t|\n"
                        for t, p, r, _ in nodes)
    names_dmp = "".join(f"{t}\t|\t{n}\t|\t\t|\tscientific name\t|\n"
                        for t, p, r, n in nodes)
    return refs, (nodes_dmp, names_dmp)


def make_reads_vec(references, seed: int = 99, n_reads: int = 50_000,
                   read_len: tuple = (1_000, 3_000), err: float = 0.10,
                   length_weighted: bool = True):
    """Vectorized long-read simulator: (name, seq, qual) tuples whose names
    encode the true source tid + position (`S_<tid>.<i>`), ~err total error
    split 1/3 sub, 1/3 ins, 1/3 del (mutate_read semantics, vectorized)."""
    rng = np.random.default_rng(seed)
    code = np.zeros(256, dtype=np.uint8)
    for j, b in enumerate(b"ACGT"):
        code[b] = j
    lens = np.array([len(s) for _, s in references], dtype=np.float64)
    p = lens / lens.sum() if length_weighted else None
    gis = rng.choice(len(references), size=n_reads, p=p)
    reads = []
    for i in range(n_reads):
        gi = int(gis[i])
        name, seq = references[gi]
        tid = name.split("|")[1]
        L = int(rng.integers(read_len[0], min(read_len[1], len(seq) - 1)))
        st = int(rng.integers(0, len(seq) - L))
        frag = code[np.frombuffer(seq[st:st + L], dtype=np.uint8)]
        if rng.integers(2):
            frag = (3 - frag)[::-1]
        frag = mutate_codes(rng, frag, sub=err / 3, indel=2 * err / 3)
        reads.append((f"S_{tid}.{i}", codes_to_seq(frag),
                      b"I" * frag.size))
    return reads
