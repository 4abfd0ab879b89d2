"""The standalone desamba.h-compatible shared library (native/so_api.cpp).

dlopen-style driver mirroring the reference's .so harnesses
(main_test.c:29-58, main_test_2.c:30-90): load_index once, read_classify in
both path and in-memory modes, meta_analysis with both flags, and the
empty-input graceful paths. Outputs compared byte-for-byte against the
committed reference goldens.
"""
import ctypes
import os
import shutil
import subprocess

import pytest

GOLD = os.path.join(os.path.dirname(os.path.abspath(__file__)), "golden")
NATIVE = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "native")
LIB = os.path.join(NATIVE, "libdesamba_tpu.so")


@pytest.fixture(scope="module")
def so(golden_index_dir):
    src = os.path.join(NATIVE, "so_api.cpp")
    if not os.path.exists(LIB) or os.path.getmtime(LIB) < max(
        os.path.getmtime(src),
        os.path.getmtime(os.path.join(NATIVE, "classify_host.cpp")),
    ):
        subprocess.run(["make", "-C", NATIVE], check=True, capture_output=True)
    # index dir must also hold nodes.dmp/names.dmp (desamba.h:9)
    for f in ("nodes.dmp", "names.dmp"):
        shutil.copy(os.path.join(GOLD, f), golden_index_dir)
    lib = ctypes.CDLL(LIB)
    lib.load_index.argtypes = [ctypes.POINTER(ctypes.c_void_p), ctypes.c_char_p]
    lib.read_classify.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_uint64,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_char)),
        ctypes.POINTER(ctypes.c_uint64), ctypes.c_int, ctypes.c_int,
    ]
    lib.meta_analysis.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_uint64,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_char)),
        ctypes.POINTER(ctypes.c_uint64), ctypes.c_int, ctypes.c_int,
        ctypes.c_uint64,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_char)),
        ctypes.POINTER(ctypes.c_uint64),
    ]
    lib.free_index.argtypes = [ctypes.c_void_p]
    idx = ctypes.c_void_p()
    lib.load_index(ctypes.byref(idx), golden_index_dir.encode())
    assert idx.value, "load_index failed"
    yield lib, idx
    lib.free_index(idx)


def _classify(lib, idx, data, input_n, thread_id=0, thread_num=1):
    out = ctypes.POINTER(ctypes.c_char)()
    out_n = ctypes.c_uint64()
    lib.read_classify(idx, data, input_n, ctypes.byref(out),
                      ctypes.byref(out_n), thread_id, thread_num)
    return ctypes.string_at(out, out_n.value).decode()


def _meta(lib, idx, sam: bytes, flag, max_snap=1000, thread_id=0):
    out = ctypes.POINTER(ctypes.c_char)()
    out_n = ctypes.c_uint64()
    snap = ctypes.POINTER(ctypes.c_char)()
    snap_n = ctypes.c_uint64()
    lib.meta_analysis(idx, sam, len(sam), ctypes.byref(out),
                      ctypes.byref(out_n), thread_id, flag, max_snap,
                      ctypes.byref(snap), ctypes.byref(snap_n))
    rep = ctypes.string_at(out, out_n.value).decode()
    s = ctypes.string_at(snap, snap_n.value).decode() if snap else None
    return rep, s


def test_read_classify_path_mode(so):
    lib, idx = so
    sam = _classify(lib, idx, os.path.join(GOLD, "reads.fq").encode(),
                    ctypes.c_uint64(-1).value, thread_id=1)
    assert sam == open(os.path.join(GOLD, "classify_full.sam")).read()


def test_read_classify_string_mode(so):
    lib, idx = so
    data = open(os.path.join(GOLD, "reads.fq"), "rb").read()
    sam = _classify(lib, idx, data, len(data), thread_id=2)
    assert sam == open(os.path.join(GOLD, "classify_full.sam")).read()


def test_read_classify_multithread_same_output(so):
    """Reads striped over 3 workers still emit in read order; identical
    output here because per-worker buffer state doesn't flip filter modes
    on this read set."""
    lib, idx = so
    data = open(os.path.join(GOLD, "reads.fq"), "rb").read()
    sam = _classify(lib, idx, data, len(data), thread_id=5, thread_num=3)
    assert sam == open(os.path.join(GOLD, "classify_full.sam")).read()


@pytest.mark.parametrize("flag", [0, 1])
def test_meta_analysis_flags(so, flag):
    lib, idx = so
    sam = open(os.path.join(GOLD, "classify_full.sam"), "rb").read()
    rep, snap = _meta(lib, idx, sam, flag)
    assert rep == open(os.path.join(GOLD, f"meta_so_flag{flag}.txt")).read()
    if flag == 0:
        assert (snap or "")[:1000] == open(
            os.path.join(GOLD, "meta_so_snapshot.txt")).read()


def test_full_roundtrip_classify_then_meta(so):
    """The main_test.c flow: classify a file then analyze its SAM."""
    lib, idx = so
    sam = _classify(lib, idx, os.path.join(GOLD, "reads.fq").encode(),
                    ctypes.c_uint64(-1).value, thread_id=7)
    rep, snap = _meta(lib, idx, sam.encode(), 0)
    assert rep == open(os.path.join(GOLD, "meta_so_flag0.txt")).read()


def test_empty_inputs(so):
    lib, idx = so
    assert _classify(lib, idx, b"", 0) == ""
    rep, snap = _meta(lib, idx, b"", 0)
    assert rep == ""
    assert snap in (None, "")


def test_no_match_gate(so):
    """> 95% unclassified -> fixed no_match line (cly_mt.c:1389-1394)."""
    lib, idx = so
    sam = "".join(
        f"r{i}\t4\t*\t0\t0\t*\t*\t0\t0\tACGT\tIIII\t\n" for i in range(30)
    ).encode()
    rep, snap = _meta(lib, idx, sam, 0)
    assert rep == "no_match\tnull|null\tnull\t0\n"


def test_thread_pool_cycling(so):
    """main_test.c:46-58 pool pattern: cycle thread_ids, buffers reused."""
    lib, idx = so
    data = open(os.path.join(GOLD, "reads.fq"), "rb").read()
    exp = open(os.path.join(GOLD, "classify_full.sam")).read()
    for i in range(6):
        sam = _classify(lib, idx, data, len(data), thread_id=i % 3)
        assert sam == exp


def _mixed_length_reads():
    """A workload that FLIPS the per-worker filter-mode ladder
    (cly.c:2953-2981) mid-stream: read 0 is a 600 bp read (ratchets
    max_read_l past NGS_MAX_READ_L=510 for whichever worker gets it);
    the rest are noisy 330 bp reads whose scores land between the NGS
    threshold (26) and the 3G ladder (64/74) — kept by a worker still in
    NGS mode, zeroed by a worker whose ladder flipped. With 2-worker
    striping, worker 0 flips after read 0 while worker 1 never does."""
    import numpy as np

    from desamba_tpu.io.fastx import read_fastx
    from testdata import mutate_read

    refs = [r.seq for r in read_fastx(os.path.join(GOLD, "ref.fa"))]
    rng = np.random.default_rng(77)
    code = np.zeros(256, np.uint8)
    for j, b in enumerate(b"ACGT"):
        code[b] = j
    reads = []
    frag = code[np.frombuffer(refs[0][5000:5600], np.uint8)]
    reads.append(("mix_long.0", mutate_read(rng, frag, 0.05), b""))
    for i in range(1, 11):
        g = refs[i % len(refs)]
        st = 2000 + 700 * i
        frag = code[np.frombuffer(g[st : st + 330], np.uint8)]
        reads.append((f"mix_short.{i}", mutate_read(rng, frag, 0.20), b""))
    return [(n, s, b"I" * len(s)) for n, s, _ in reads]


def _striped_oracle_sam(oi, reads, n_workers):
    """The ground truth: per-worker OracleClassifier buffers, reads
    striped w, w+T, ... (kt_for without stealing), SAM_FULL in read
    order."""
    from desamba_tpu.oracle.driver import OracleClassifier, format_sam

    workers = [OracleClassifier(oi) for _ in range(n_workers)]
    res = [None] * len(reads)
    for w in range(n_workers):
        for i in range(w, len(reads), n_workers):
            name, seq, qual = reads[i]
            res[i] = workers[w].classify_read(name, seq, qual)
    return "".join(format_sam(oi, r, True) for r in res)


def test_mixed_length_filter_mode_so_registry(so, golden_oracle_index):
    """VERDICT r3 item 9 (.so side): read_classify with thread_num=2 on
    the mode-flipping workload must equal the 2-worker striped oracle —
    and must NOT equal the single-worker run (proving the ladder actually
    diverged across workers in this test)."""
    lib, idx = so
    reads = _mixed_length_reads()
    fq = b"".join(b"@" + n.encode() + b"\n" + s + b"\n+\n" + q + b"\n"
                  for n, s, q in reads)
    sam2 = _classify(lib, idx, fq, len(fq), thread_id=21, thread_num=2)
    exp2 = _striped_oracle_sam(golden_oracle_index, reads, 2)
    assert sam2 == exp2
    sam1 = _classify(lib, idx, fq, len(fq), thread_id=22, thread_num=1)
    exp1 = _striped_oracle_sam(golden_oracle_index, reads, 1)
    assert sam1 == exp1
    assert sam1 != sam2, (
        "workload failed to flip the ladder differently across workers")


def test_mixed_length_filter_mode_persists_across_calls(so,
                                                        golden_oracle_index):
    """The registry keeps per-thread_id buffers BETWEEN read_classify
    calls (cly_mt.c:963-1006): a first call containing the long read
    leaves thread 23's worker ladder flipped, so a second call of only
    short reads is judged in 3G mode — unlike a fresh thread_id."""
    lib, idx = so
    reads = _mixed_length_reads()
    long_fq = b"".join(b"@" + n.encode() + b"\n" + s + b"\n+\n" + q + b"\n"
                       for n, s, q in reads[:1])
    short_fq = b"".join(b"@" + n.encode() + b"\n" + s + b"\n+\n" + q + b"\n"
                        for n, s, q in reads[1:])
    _classify(lib, idx, long_fq, len(long_fq), thread_id=23, thread_num=1)
    flipped = _classify(lib, idx, short_fq, len(short_fq), thread_id=23,
                        thread_num=1)
    fresh = _classify(lib, idx, short_fq, len(short_fq), thread_id=24,
                      thread_num=1)
    from desamba_tpu.oracle.driver import OracleClassifier, format_sam

    w = OracleClassifier(golden_oracle_index)
    w.classify_read(*reads[0])
    exp_flipped = "".join(
        format_sam(golden_oracle_index, w.classify_read(n, s, q), True)
        for n, s, q in reads[1:])
    assert flipped == exp_flipped
    assert flipped != fresh, "ladder state leaked or never flipped"
