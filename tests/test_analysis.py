import os
import subprocess
import sys

import pytest

from conftest import REF_BIN, needs_ref_binary

from desamba_tpu.analysis.meta import ana_meta_report, meta_analysis
from desamba_tpu.io.taxonomy import load_taxonomy_cli, load_taxonomy_engine

GOLD = os.path.join(os.path.dirname(os.path.abspath(__file__)), "golden")


def test_ana_meta_cli_matches_golden():
    tax = load_taxonomy_cli(os.path.join(GOLD, "nodes.dmp"))
    sam = open(os.path.join(GOLD, "classify.sam")).read()
    got = ana_meta_report(sam, tax, os.path.join(GOLD, "classify.sam"))
    # the golden embeds the original path label
    exp = open(os.path.join(GOLD, "ana_meta.txt")).read()
    assert got == exp


@pytest.mark.parametrize("flag", [0, 1])
def test_meta_analysis_so_matches_golden(flag):
    tax = load_taxonomy_engine(GOLD)
    sam = open(os.path.join(GOLD, "classify_full.sam")).read()
    rep, snap = meta_analysis(sam, tax, flag, 1000)
    exp = open(os.path.join(GOLD, f"meta_so_flag{flag}.txt")).read()
    assert rep == exp
    if flag == 0:
        esnap = open(os.path.join(GOLD, "meta_so_snapshot.txt")).read()
        assert (snap or "")[:1000] == esnap


def test_meta_analysis_no_match_path():
    """> 95% unclassified -> the fixed no_match line (cly_mt.c:1389-1394)."""
    tax = load_taxonomy_engine(GOLD)
    sam = "".join(
        f"r{i}\t4\t*\t0\t0\t*\t*\t0\t0\tACGT\tIIII\t\n" for i in range(30)
    )
    rep, snap = meta_analysis(sam, tax, 0, 100)
    assert rep == "no_match\tnull|null\tnull\t0\n"
    assert snap is None


def test_engine_api_roundtrip(golden_index_dir):
    """Engine mirrors desamba.h: load once, classify (SAM_FULL), analyze."""
    import shutil

    from desamba_tpu.engine.api import Engine

    d = golden_index_dir
    shutil.copy(os.path.join(GOLD, "nodes.dmp"), d)
    shutil.copy(os.path.join(GOLD, "names.dmp"), d)
    eng = Engine(str(d))
    sam = eng.read_classify(os.path.join(GOLD, "reads.fq"), thread_id=3, thread_num=1)
    assert sam == open(os.path.join(GOLD, "classify_full.sam")).read()
    rep, snap = eng.meta_analysis(sam, thread_id=3)
    assert rep == open(os.path.join(GOLD, "meta_so_flag0.txt")).read()
    assert (snap or "")[:1000] == open(os.path.join(GOLD, "meta_so_snapshot.txt")).read()
    # empty input contract (cly_mt.c:1310-1313, 1331-1336)
    assert eng.read_classify(b"") == ""
    assert eng.meta_analysis("") == ("", None)


def test_cli_ana_meta(tmp_path, capsys):
    from desamba_tpu.analysis import cli_cmds

    rc = cli_cmds.dispatch(
        "ana_meta", [os.path.join(GOLD, "classify.sam"), os.path.join(GOLD, "nodes.dmp")]
    )
    assert rc == 0
    out = capsys.readouterr().out
    assert out == open(os.path.join(GOLD, "ana_meta.txt")).read()
