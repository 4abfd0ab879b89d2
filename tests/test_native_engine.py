"""Native C++ host engine (native/classify_host.cpp) golden-equality tests.

The engine is a port of the Python oracle; with n_threads=1 its SAM output
must equal the committed reference-binary goldens byte-for-byte
(tests/golden/classify.sam), same as the oracle itself.
"""
import os

import pytest

from desamba_tpu.io.fastx import read_fastx
from desamba_tpu.oracle.driver import format_sam

GOLD = os.path.join(os.path.dirname(os.path.abspath(__file__)), "golden")


@pytest.fixture(scope="module")
def native_cl(golden_oracle_index):
    from desamba_tpu.engine.native import NativeClassifier

    return NativeClassifier(golden_oracle_index, n_threads=1)


@pytest.fixture(scope="module")
def golden_reads():
    return [(r.name, r.seq, r.qual) for r in read_fastx(os.path.join(GOLD, "reads.fq"))]


def test_native_matches_golden_sam(golden_oracle_index, native_cl, golden_reads):
    results = native_cl.classify_batch(golden_reads)
    assert not any(getattr(r, "aborted", False) for r in results)
    got = "".join(format_sam(golden_oracle_index, r, False) for r in results)
    exp = open(os.path.join(GOLD, "classify.sam")).read()
    assert got == exp


def test_native_matches_golden_sam_full(golden_oracle_index, native_cl, golden_reads):
    results = native_cl.classify_batch(golden_reads)
    got = "".join(format_sam(golden_oracle_index, r, True) for r in results)
    exp = open(os.path.join(GOLD, "classify_full.sam")).read()
    assert got == exp


def test_native_multithreaded_deterministic(golden_oracle_index, golden_reads):
    """4-thread striping must give identical per-read hits on the golden set
    (all golden reads are in the same length class, so per-worker max_read_l
    evolution cannot flip the filter mode)."""
    from desamba_tpu.engine.native import NativeClassifier

    nc1 = NativeClassifier(golden_oracle_index, n_threads=1)
    nc4 = NativeClassifier(golden_oracle_index, n_threads=4)
    r1 = nc1.classify_batch(golden_reads)
    r4 = nc4.classify_batch(golden_reads)
    got1 = "".join(format_sam(golden_oracle_index, r, False) for r in r1)
    got4 = "".join(format_sam(golden_oracle_index, r, False) for r in r4)
    assert got1 == got4


def test_native_empty_and_short_reads(golden_oracle_index):
    from desamba_tpu.engine.native import NativeClassifier

    nc = NativeClassifier(golden_oracle_index, n_threads=2)
    results = nc.classify_batch(
        [("tiny", b"ACGT", b"IIII"), ("n39", b"A" * 39, None)]
    )
    assert all(r.hits == [] for r in results)
    sam = "".join(format_sam(golden_oracle_index, r, False) for r in results)
    assert sam.count("\t4\t*\t0\t0\t*\t*\t0\t0\t") == 2


def test_mixed_length_filter_mode_native_pool(golden_oracle_index):
    """VERDICT r3 item 9 (C++ pool side): NativeClassifier with 2 striped
    workers on the mode-flipping workload (test_so_api._mixed_length_reads)
    must match per-worker-buffer oracle runs read for read, and diverge
    from its own n_threads=1 output (the max_read_l ladder,
    cly.c:2953-2981, really split across workers)."""
    from desamba_tpu.engine.native import NativeClassifier
    from desamba_tpu.oracle.driver import OracleClassifier
    from test_so_api import _mixed_length_reads

    oi = golden_oracle_index
    reads = _mixed_length_reads()

    def hits_sig(res):
        return [
            [(h.ref_ID, h.sum_score, h.primary, h.q_st, h.q_ed)
             for h in r.hits] for r in res]

    for T in (1, 2):
        nat = NativeClassifier(oi, n_threads=T)
        got = hits_sig(nat.classify_batch(reads))
        workers = [OracleClassifier(oi) for _ in range(T)]
        exp = [None] * len(reads)
        for w in range(T):
            for i in range(w, len(reads), T):
                exp[i] = workers[w].classify_read(*reads[i])
        assert got == hits_sig(exp), f"T={T}"
        if T == 1:
            sig1 = got
    assert got != sig1, "workload failed to diverge across workers"
