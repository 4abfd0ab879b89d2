import os
import subprocess

import numpy as np
import pytest

from conftest import REF_BIN, needs_ref_binary
from testdata import make_references, write_demo

from desamba_tpu.index.build import build_index
from desamba_tpu.index.format_ref import (
    RefFormatIndex,
    compare_index_dirs,
    save_ref_format,
)
from desamba_tpu.index.kmers import extract_kmers, write_kmer_srt
from desamba_tpu.io.fastx import SeqRecord, write_fasta


def _records(refs):
    return [SeqRecord(n, "", s, None) for n, s in refs]


def small_refs():
    return make_references(seed=3, n_genomes=2, length=4000)


def test_bwt_invariants():
    refs = small_refs()
    idx = build_index(_records(refs))
    N = idx.n_unitig
    L = idx.bwt_len
    # row count = n_kmer + 31 * n_unitig
    assert L == idx.n_kmer + 31 * N
    # sentinel rows first, one per unitig; dollar at N-1
    assert idx.dollar_pos == N - 1
    cnt = np.bincount(idx.bwt_codes, minlength=6)
    assert cnt[4] == N - 1 and cnt[5] == 1
    assert idx.rank[0] == N
    # hash13 is monotone and covers [N, L]
    assert (np.diff(idx.hash13) >= 0).all()
    assert idx.hash13[-1] <= L


def test_lf_walk_reconstructs_unitig_string(tmp_path):
    """Backward LF walk from '$' must spell the concatenated unitig string —
    exactly the procedure of bwt_cal_SA (idx.c:1163-1237) which the builder
    replaced with direct construction."""
    refs = make_references(seed=5, n_genomes=1, length=2500)
    idx = build_index(_records(refs))
    save_ref_format(idx, str(tmp_path))
    fm = RefFormatIndex(str(tmp_path))
    L = idx.bwt_len
    # reconstruct S backwards
    S = np.empty(L, dtype=np.uint8)
    pos = L - 1
    S[pos] = 5  # '$'
    r = idx.dollar_pos
    while True:
        c = int(fm.bwt_code_at(np.array([r]))[0])
        if c == 5:
            break
        pos -= 1
        S[pos] = c
        if c == 4:  # '#': LF via rank[4]=0 + occ
            r = int(fm.occ(np.array([r]), np.array([4]))[0])
        else:
            r = int(fm.rank[c] + fm.occ(np.array([r]), np.array([c]))[0])
    assert pos == 0
    # S must contain each unitig terminated by its sentinel, in unitig order
    exp_sent = np.concatenate([[0], np.cumsum(idx.uni_len + 1)])[1:] - 1
    assert (S[exp_sent[:-1]] == 4).all()
    assert S[exp_sent[-1]] == 5
    # and every 31-mer of every unitig must be findable via hash13 + backward ext
    # (spot-check a few via the sampled SA)
    assert idx.sa_uni.size == (L + 7) // 8


def test_kmer_srt_roundtrip(tmp_path):
    refs = small_refs()
    km = extract_kmers(_records(refs))
    assert (np.diff(km.astype(np.int64)) > 0).all()
    p = tmp_path / "kmer.srt"
    write_kmer_srt(str(p), km)
    from desamba_tpu.index.kmers import read_kmer_srt

    assert np.array_equal(read_kmer_srt(str(p)), km)


@needs_ref_binary
def test_index_matches_reference_binary(tmp_path):
    """Build the same index with the compiled reference binary and with our
    builder; the on-disk logical contents must agree exactly."""
    refs = make_references(seed=11, n_genomes=2, length=8000)
    fa = tmp_path / "ref.fa"
    write_fasta(str(fa), refs)
    km = extract_kmers(_records(refs))
    srt = tmp_path / "kmer.srt"
    write_kmer_srt(str(srt), km)
    ref_dir = tmp_path / "ref_idx"
    subprocess.run(
        [REF_BIN, "index", str(srt), str(fa), str(ref_dir)],
        check=True,
        capture_output=True,
    )
    my_dir = tmp_path / "my_idx"
    idx = build_index(str(fa))
    assert idx.n_kmer == km.size
    save_ref_format(idx, str(my_dir))
    diffs = compare_index_dirs(str(ref_dir), str(my_dir))
    assert diffs == [], "\n".join(diffs)


def test_build_chunked_paths_match_single_chunk():
    """The streaming k-mer/exist-filter passes (round-5 bounded-RSS
    builder) must produce the identical index when the data spans MANY
    chunks as when it fits one — small test genomes otherwise never
    exercise the multi-chunk code (chunk-boundary windows, per-bucket
    cursors, chunked bloom fills)."""
    import numpy as np

    from desamba_tpu.index import build as B
    from testdata import make_references

    refs = make_references(seed=31, n_genomes=2, length=30_000)
    recs = [type("R", (), dict(name=n, seq=s))() for n, s in refs]
    base = B.build_index(recs)
    old = (B.KMER_CHUNK, B.EK_CHUNK)
    try:
        B.KMER_CHUNK = 4096   # ~15 chunks over 60 kbp
        B.EK_CHUNK = 4096
        small = B.build_index(recs)
    finally:
        B.KMER_CHUNK, B.EK_CHUNK = old
    assert np.array_equal(base.bwt_codes, small.bwt_codes)
    assert np.array_equal(base.sa_uni, small.sa_uni)
    assert np.array_equal(base.sa_off, small.sa_off)
    assert np.array_equal(base.hash13, small.hash13)
    assert np.array_equal(base.refpos_global, small.refpos_global)
    assert np.array_equal(base.uni_reflist, small.uni_reflist)
    assert np.array_equal(base.ek0, small.ek0)
    assert np.array_equal(base.ek1, small.ek1)
