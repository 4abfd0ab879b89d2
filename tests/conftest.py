import os
import sys

# CPU-only 8-device virtual mesh for all tests; must be set before jax import.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pytest  # noqa: E402

REF_BIN = os.environ.get("DESAMBA_REF_BIN", "/tmp/refbuild/bin/deSAMBA")


def have_ref_binary() -> bool:
    return os.path.exists(REF_BIN) and os.access(REF_BIN, os.X_OK)


needs_ref_binary = pytest.mark.skipif(
    not have_ref_binary(),
    reason="compiled reference binary not available (set DESAMBA_REF_BIN)",
)
