"""Data tooling: fqx (tools/fqx.c equivalent) and build-index script."""
import gzip
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_fqx_extracts_acgt_runs(tmp_path):
    from desamba_tpu.io.fastx import read_fastx
    from desamba_tpu.tools.fqx import fqx

    src = tmp_path / "raw.bin"
    # runs: 12 (kept), 5 (dropped), 10 at EOF without terminator (kept)
    src.write_bytes(b"xx" + b"ACGTACGTACGT" + b"??" + b"ACGTA" + b"!!"
                    + b"acgtacgtgt")
    out = tmp_path / "out.fq.gz"
    n = fqx(str(src), str(out), threshold=10)
    assert n == 2
    assert out.read_bytes()[:2] == b"\x1f\x8b"  # always gzip (fqx.c:10)
    recs = list(read_fastx(str(out)))
    assert [r.name for r in recs] == ["0", "1"]
    assert recs[0].seq == b"ACGTACGTACGT"
    assert recs[1].seq == b"acgtacgtgt"
    assert recs[0].qual == b"I" * 12 and recs[1].qual == b"I" * 10


def test_fqx_on_random_text(tmp_path):
    from desamba_tpu.tools.fqx import fqx, random_text

    src = tmp_path / "rnd.txt"
    src.write_bytes(random_text(200_000, seed=7))
    out = tmp_path / "rnd.fq.gz"
    n = fqx(str(src), str(out), threshold=10)
    # P(run >= 10) is tiny for uniform printable bytes — expect none or few
    assert n < 5
    n2 = fqx(str(src), str(out), threshold=2)
    assert n2 > 100  # short runs are common


def test_build_index_script(tmp_path):
    sys.path.insert(0, os.path.join(REPO, "tests"))
    from testdata import write_demo

    write_demo(str(tmp_path / "d"), n_genomes=2, length=16000, n_reads=2)
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    p = subprocess.run(
        ["bash", os.path.join(REPO, "build-index"),
         str(tmp_path / "d" / "ref.fa"), str(tmp_path / "idx")],
        capture_output=True, text=True, env=env, cwd=REPO)
    assert p.returncode == 0, p.stderr
    assert "finished building index!" in p.stdout
    assert os.path.exists(tmp_path / "idx" / "deSAMBA.bwt")
    # nodes.dmp written by write_demo next to ref.fa is copied in
    if os.path.exists(tmp_path / "d" / "nodes.dmp"):
        assert os.path.exists(tmp_path / "idx" / "nodes.dmp")
