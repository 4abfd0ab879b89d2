"""Full `analysis` command-surface parity vs the compiled reference binary.

Every subcommand of simDataTest (analysis.c:2707-2751) is run through both
our CLI and the reference binary on the same inputs; stdout AND stderr must
be byte-identical. Skipped when the reference binary is unavailable (the
driver/test host builds it from /root/reference into /tmp/refbuild).
"""
import os
import random
import subprocess
import sys

import pytest

from conftest import REF_BIN, needs_ref_binary

GOLD = os.path.join(os.path.dirname(os.path.abspath(__file__)), "golden")
SAM = os.path.join(GOLD, "classify.sam")
NODES = os.path.join(GOLD, "nodes.dmp")
FQ = os.path.join(GOLD, "reads.fq")
FA = os.path.join(GOLD, "ref.fa")


@pytest.fixture(scope="module")
def inputs(tmp_path_factory):
    d = tmp_path_factory.mktemp("ana_inputs")
    rng = random.Random(5)
    tids = [9606, 562, 1773, 2697049]
    kai = d / "kai.txt"
    with open(kai, "w") as f:
        for i in range(30):
            if i % 5 == 4:
                f.write(f"U\tread_{i}\t0\n")
            else:
                f.write(
                    f"C\tread_{i}\t77\t142\t{rng.choice(tids)},{rng.choice(tids)}\n"
                )
    cen = d / "cen.txt"
    with open(cen, "w") as f:
        for i in range(30):
            t = rng.choice(tids) if i % 6 else 0
            f.write(f"read_{i}\tcid|abc\t{t}\t100\t0\t80\t1500\t1\t2400\n")
    paf = d / "paf.txt"
    with open(paf, "w") as f:
        for i in range(30):
            f.write(
                f"read_{i}\t1500\t10\t1400\t+\ttid|{rng.choice(tids)}|ref|x"
                f"\t30000\t5\t1390\t1000\t1400\t60\n"
            )
    mm = d / "mm.txt"
    with open(mm, "w") as f:
        for i in range(20):
            t = rng.choice(tids)
            sub = f"x{i % 3}" if i % 4 == 0 else str(t)
            f.write(
                f"read_{i % 8} {1200 + i} 0 {1200 + i} + c{i}d0|{sub}|NZ_{i} "
                f"f1 f2 f3 f4 f5 f6 f7 0.{80 + i % 19}\n"
            )
    exch = d / "exch.txt"
    with open(exch, "w") as f:
        for k in range(3):
            f.write(f"x{k}\t{tids[k]}\n")
    lens = d / "lens.txt"
    with open(lens, "w") as f:
        for i in range(40):
            f.write(f"{i} {1000 + 13 * i}\n")
    kai_id = d / "kai_id.txt"
    with open(kai_id, "w") as f:
        for i in range(20):
            f.write(f"C\tkai_read_id{i}\t77\t142\t{rng.choice(tids)}\n")
    blast = d / "blast.txt"
    with open(blast, "w") as f:
        for i in range(20):
            st = rng.randint(1, 500)
            ed = st + rng.randint(50, 300)
            f.write(
                f"read_{i % 7}\tsubj\t98.5\t{ed - st}\t3\t1\t{st}\t{ed}"
                f"\t100\t400\t1e-10\t200\n"
            )
    names = []
    for line in open(SAM):
        n = line.split("\t")[0]
        if n not in names:
            names.append(n)
    filt = d / "filter_sam.txt"
    with open(filt, "w") as f:
        for i, n in enumerate(names):
            f.write(f"{n} {'P' if i % 4 else 'F'}\n")
    from desamba_tpu.analysis import dumpers

    rst = d / "golden.rst"
    with open(rst, "w") as out:
        dumpers.dump_des_sam(SAM, out)
    return dict(kai=str(kai), cen=str(cen), paf=str(paf), mm=str(mm),
                exch=str(exch), lens=str(lens), kai_id=str(kai_id),
                blast=str(blast), filt=str(filt), rst=str(rst))


def _commands(inp):
    first_read = open(FQ).readline()[1:].split()[0]
    unv = os.path.join("/tmp/desamba_tpu_test_cache/golden_idx", "deSAMBA.unv")
    cmds = [
        ["ana_meta", SAM, NODES],
        ["ana_meta", SAM, NODES, "print_list"],
        ["ana_meta_base", SAM, NODES],
        ["ana_meta_cen", inp["cen"], NODES],
        ["ana_meta_cen_base", inp["cen"], NODES],
        ["ana_meta_kai", inp["kai"], NODES],
        ["ana_meta_kai_base", inp["kai_id"], NODES, inp["lens"]],
        ["ana_matemaps_base", inp["mm"], NODES, inp["exch"]],
        ["ana_meta_rst", inp["rst"], NODES],
        ["ana_species", SAM, "562", NODES],
        ["ana_genus", SAM, "561", NODES],
        ["ana_sam", SAM, "562", NODES, "species"],
        ["ana_paf", inp["paf"], "562", NODES, "species"],
        ["ana_cen", inp["cen"], "562", NODES, "species"],
        ["ana_kai", inp["kai"], "562", NODES, "species"],
        ["ana_BLASTN", inp["blast"]],
        ["ana_sam_filter", SAM, "562", NODES, "species", inp["filt"]],
        ["ana_dump_filter", inp["rst"], "562", NODES, "species", inp["filt"]],
        ["mark_genus", SAM, NODES],
        ["count_base", FQ],
        ["get_read_by_NAME", FQ, first_read],
        ["reverse_read", FQ],
        ["cen_map", FA],
        ["split_fastq", FQ, "3", "7"],
        ["pacbio_filter", FQ],
        ["fastq_to_fasta", FQ],
        ["fastq_to_name", FQ],
        ["rst_stat", inp["rst"]],
        ["file_name", FA],
        ["file_cmp", FQ, FQ],
    ]
    if os.path.exists(unv):
        cmds.append(["ana_univ", unv])
    return cmds


@needs_ref_binary
def test_analysis_suite_matches_reference(inputs, golden_index_dir):
    failures = []
    for cmd in _commands(inputs):
        ours = subprocess.run(
            [sys.executable, "-m", "desamba_tpu.cli", "analysis"] + cmd,
            capture_output=True, cwd=os.path.dirname(GOLD) + "/..",
        )
        ref = subprocess.run([REF_BIN, "analysis"] + cmd, capture_output=True)
        if ours.stdout != ref.stdout or ours.stderr != ref.stderr:
            failures.append(cmd[0])
    assert not failures, f"analysis commands diverge from reference: {failures}"


def test_ana_meta_base_runs_without_binary(inputs):
    """base-weighted report executes and has the reference's shape."""
    from desamba_tpu.analysis.dumpers import read_rst_file
    from desamba_tpu.analysis.meta import ana_meta_base_report_from_rsts
    from desamba_tpu.io.taxonomy import load_taxonomy_cli

    tax = load_taxonomy_cli(NODES)
    rsts = read_rst_file(inputs["rst"])
    rep = ana_meta_base_report_from_rsts(rsts, tax, "x.temp", m2=True)
    assert rep.startswith("Current read x.temp\tx.temp\t")
    assert "Analysis based on base number:" in rep
    assert "total_mapped_base_number :" in rep
