import os

import numpy as np
import pytest

from desamba_tpu.index.build import build_index
from desamba_tpu.index.format_ref import RefFormatIndex, save_ref_format
from desamba_tpu.index.tensor_index import from_oracle_index
from desamba_tpu.oracle.classify import OracleIndex, store_kmers, exist_probe
from desamba_tpu.utils import codec

GOLD = os.path.join(os.path.dirname(os.path.abspath(__file__)), "golden")


@pytest.fixture(scope="module")
def oi(golden_oracle_index):
    return golden_oracle_index


@pytest.fixture(scope="module")
def ti(oi):
    return from_oracle_index(oi)


def test_u64emu_hashes():
    import jax.numpy as jnp

    from desamba_tpu.ops import u64emu
    from desamba_tpu.utils.hashes import hash64_1, hash64_2

    rng = np.random.default_rng(1)
    vals = rng.integers(0, 1 << 40, 1000, dtype=np.uint64)
    hi = jnp.asarray((vals >> 32).astype(np.uint32))
    lo = jnp.asarray((vals & 0xFFFFFFFF).astype(np.uint32))
    for emu, ref in ((u64emu.hash64_1, hash64_1), (u64emu.hash64_2, hash64_2)):
        h, l = emu((hi, lo))
        got = (np.asarray(h).astype(np.uint64) << 32) | np.asarray(l).astype(np.uint64)
        assert np.array_equal(got, ref(vals))


def test_occ_matches_oracle(oi, ti):
    from desamba_tpu.ops.fm import FmArrays, occ

    fm = FmArrays(ti)
    rng = np.random.default_rng(2)
    r = rng.integers(0, oi.L + 1, 4096).astype(np.int32)
    c = rng.integers(0, 5, 4096).astype(np.int32)
    got = np.asarray(occ(fm, r, c))
    exp = oi.cum[c, r]
    assert np.array_equal(got, exp)


def test_probe_matches_oracle(oi, ti):
    from desamba_tpu.ops.ekmer import EkArrays, probe_reads

    ek = EkArrays(ti)
    rng = np.random.default_rng(3)
    lek = oi.ek.len_e_kmer
    B, L = 8, 300
    codes = rng.integers(0, 4, (B, L)).astype(np.uint8)
    # splice in some real reference content so probes hit
    ref = codec.unpack_2bit_all(oi.ref_bin, oi.ref_bin.size * 4)
    for b in range(B):
        st = int(rng.integers(0, ref.size - 150))
        codes[b, 50:200] = ref[st : st + 150]
    lengths = rng.integers(lek + 5, L + 1, B).astype(np.int32)
    got = np.asarray(probe_reads(ek, codes, lengths))
    for b in range(B):
        n = int(lengths[b]) - lek + 1
        kmers = store_kmers(codes[b, : lengths[b]], n, lek, oi.ek.single_base_max)
        exp = exist_probe(oi, kmers)
        assert np.array_equal(got[b, :n], exp), f"lane {b}"
        assert not got[b, n:].any()
