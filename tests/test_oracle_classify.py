import os
import subprocess

import pytest

from conftest import REF_BIN, needs_ref_binary

from desamba_tpu.index.build import build_index
from desamba_tpu.index.format_ref import RefFormatIndex, save_ref_format
from desamba_tpu.io.fastx import read_fastx
from desamba_tpu.oracle.classify import OracleIndex
from desamba_tpu.oracle.driver import OracleClassifier, format_sam

GOLD = os.path.join(os.path.dirname(os.path.abspath(__file__)), "golden")


@pytest.fixture(scope="module")
def golden_index(golden_oracle_index):
    return golden_oracle_index


def _run_oracle(idx, output_seq):
    cl = OracleClassifier(idx)
    out = []
    for r in read_fastx(os.path.join(GOLD, "reads.fq")):
        out.append(format_sam(idx, cl.classify_read(r.name, r.seq, r.qual), output_seq))
    return "".join(out)


def test_classify_sam_matches_golden(golden_index):
    """Full pipeline (our index builder + oracle classifier) must reproduce
    the committed reference-binary SAM byte-for-byte."""
    got = _run_oracle(golden_index, output_seq=False)
    exp = open(os.path.join(GOLD, "classify.sam")).read()
    assert got == exp


def test_classify_sam_full_matches_golden(golden_index):
    got = _run_oracle(golden_index, output_seq=True)
    exp = open(os.path.join(GOLD, "classify_full.sam")).read()
    assert got == exp


@needs_ref_binary
def test_goldens_are_fresh(tmp_path):
    """The committed golden SAM must match a live run of the reference binary
    against an index built by our builder (not just the one committed)."""
    from desamba_tpu.index.kmers import extract_kmers, write_kmer_srt

    srt = tmp_path / "k.srt"
    write_kmer_srt(str(srt), extract_kmers(os.path.join(GOLD, "ref.fa")))
    idx_dir = tmp_path / "idx"
    subprocess.run(
        [REF_BIN, "index", str(srt), os.path.join(GOLD, "ref.fa"), str(idx_dir)],
        check=True, capture_output=True,
    )
    p = subprocess.run(
        [REF_BIN, "classify", "-t", "1", str(idx_dir), os.path.join(GOLD, "reads.fq")],
        check=True, capture_output=True,
    )
    assert p.stdout.decode() == open(os.path.join(GOLD, "classify.sam")).read()
