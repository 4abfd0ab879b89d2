import os
import sys

# CPU-only 8-device virtual mesh for all tests; must be set before jax import.
# Force (not setdefault): the environment may preset JAX_PLATFORMS to the
# real TPU platform, whose per-op compiles make CPU-sized tests crawl.
if os.environ.get("DESAMBA_TEST_TPU") != "1":
    os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# Some environments (e.g. a tunneled-TPU sitecustomize) import jax at
# interpreter start, freezing JAX_PLATFORMS before this file runs — the
# env var above is then a silent no-op and every test op goes through
# the remote chip (slow, and a tunnel hiccup hangs the whole suite).
# Backends initialize lazily, so a config update here still wins as long
# as no computation has run yet.
if os.environ.get("DESAMBA_TEST_TPU") != "1":
    try:
        import jax

        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pytest  # noqa: E402

REF_BIN = os.environ.get("DESAMBA_REF_BIN", "/tmp/refbuild/bin/deSAMBA")


def have_ref_binary() -> bool:
    return os.path.exists(REF_BIN) and os.access(REF_BIN, os.X_OK)


needs_ref_binary = pytest.mark.skipif(
    not have_ref_binary(),
    reason="compiled reference binary not available (set DESAMBA_REF_BIN)",
)

_GOLD = os.path.join(os.path.dirname(os.path.abspath(__file__)), "golden")
_CACHE = "/tmp/desamba_tpu_test_cache/golden_idx"


@pytest.fixture(scope="session")
def golden_index_dir():
    """Reference-format index for tests/golden/ref.fa, built once per machine
    (cached in /tmp keyed by the fasta mtime+size)."""
    from desamba_tpu.index.build import build_index
    from desamba_tpu.index.format_ref import save_ref_format

    ref = os.path.join(_GOLD, "ref.fa")
    st = os.stat(ref)
    stamp = f"{st.st_mtime_ns}:{st.st_size}"
    stamp_file = os.path.join(_CACHE, "stamp.txt")
    if not (
        os.path.exists(stamp_file) and open(stamp_file).read() == stamp
    ):
        idx = build_index(ref)
        save_ref_format(idx, _CACHE)
        with open(stamp_file, "w") as f:
            f.write(stamp)
    return _CACHE


@pytest.fixture(scope="session")
def golden_oracle_index(golden_index_dir):
    from desamba_tpu.index.format_ref import RefFormatIndex
    from desamba_tpu.oracle.classify import OracleIndex

    return OracleIndex(RefFormatIndex(golden_index_dir))
