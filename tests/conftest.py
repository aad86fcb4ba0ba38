import os

# Tests run on a virtual 8-device CPU mesh so multi-chip sharding logic is
# exercised without TPU hardware (SURVEY.md §4). The axon sitecustomize pins
# jax_platforms to the TPU at interpreter start, so it must be overridden via
# jax.config AFTER import, not just the env var.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

assert len(jax.devices()) == 8, "tests expect an 8-device virtual CPU mesh"

# ---- test tiers (VERDICT r03 item 6) --------------------------------------
# The full suite exceeds 9 minutes on a 1-CPU host; `pytest -m quick` is the
# canonical fast "is HEAD green?" gate (CI runs it — .github/workflows/
# test.yml), `pytest -m mesh` the heavy engine/mesh tier. Membership is by
# module: modules dominated by pure-numpy/XLA-op numerics are quick; modules
# that build engines, servers, or multi-device mesh programs are mesh.
import pytest  # noqa: E402

_QUICK_MODULES = {
    "test_ops", "test_kernels", "test_token_fidelity", "test_data",
    "test_chat", "test_spm", "test_utils", "test_native", "test_code_exec",
    "test_checkpoint", "test_guided", "test_download", "test_quality_drift",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        mod = item.module.__name__.rsplit(".", 1)[-1]
        item.add_marker(pytest.mark.quick if mod in _QUICK_MODULES
                        else pytest.mark.mesh)
