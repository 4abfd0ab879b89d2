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
