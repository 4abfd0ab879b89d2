import os

import pytest

from desamba_tpu.io.fastx import read_fastx

GOLD = os.path.join(os.path.dirname(os.path.abspath(__file__)), "golden")


def test_tpu_engine_sam_equals_golden(golden_oracle_index):
    """The batched device engine must be bit-identical to the reference SAM
    (device FM speculation + exact host replay; fallbacks allowed but the
    bulk must come from the device)."""
    from desamba_tpu.engine.tpu_engine import TpuClassifier

    eng = TpuClassifier(golden_oracle_index, sub_batch=64)
    reads = [(r.name, r.seq, r.qual) for r in read_fastx(os.path.join(GOLD, "reads.fq"))]
    got = eng.classify_to_sam(reads, output_seq=False)
    exp = open(os.path.join(GOLD, "classify.sam")).read()
    assert got == exp
    assert eng.stats["fm_searches"] > 100
    # fallbacks must be rare
    assert eng.stats["walk_fallback"] <= eng.stats["fm_walks"] * 0.05 + 5
