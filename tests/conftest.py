"""Test configuration: run everything on a virtual 8-device CPU mesh.

Sharded code paths are exercised without TPU hardware by spoofing the
host-platform device count (SURVEY.md §4: the new framework adds
mesh-shape-parameterized tests the reference lacks).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The environment's TPU plugin (axon) force-selects itself via
# jax.config at interpreter startup, overriding JAX_PLATFORMS from the
# env. Re-pin to CPU here — conftest runs before any backend is
# initialized, so the virtual 8-device CPU platform takes effect.
jax.config.update("jax_platforms", "cpu")

jax.config.update("jax_enable_x64", False)
# Deterministic full-precision matmuls for numerical assertions; production
# code keeps the backend default (fast bf16 passes on the TPU MXU).
jax.config.update("jax_default_matmul_precision", "float32")


def pytest_addoption(parser):
    parser.addoption(
        "--runslow", action="store_true", default=False,
        help="run tests marked slow (subprocess CLIs, multi-process "
             "runs, 30k-iteration parity solves)",
    )


def pytest_collection_modifyitems(config, items):
    import pytest

    if config.getoption("--runslow") or config.getoption("-m"):
        return  # explicit marker expressions select freely
    skip = pytest.mark.skip(reason="slow: run with --runslow")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)
