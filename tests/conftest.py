"""Test configuration: CPU backend, float64, virtual 8-device mesh.

Correctness tests run on CPU in float64 (the 1e-6 golden-log gate needs f64;
TPU f32 is the *performance* path, benched separately).  The 8 virtual CPU
devices provide the multi-chip sharding harness (SURVEY.md section 4:
the TPU analogue of the reference's 1-rank vs 4-rank MPI invariance check).
"""

import os

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
# NOTE: do NOT enable the persistent compilation cache for the CPU tests:
# XLA:CPU AOT cache blobs record machine-feature sets (incl. the internal
# prefer-no-scatter/gather pseudo-features) that fail to match the host on
# reload here, and the reloaded executables mis-run (observed: a sharded
# segment that executes in 0.14 s when freshly compiled spins for minutes
# when loaded from cache).  The TPU bench keeps its own cache.

REFERENCE = "/root/reference"
REBO_FILE = f"{REFERENCE}/USER-REBOMOS/MoS.REBO.set5b"
AEAM_FILE = f"{REFERENCE}/USER-AEAM/AlSi.aeam"

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rebo_file():
    return REBO_FILE


@pytest.fixture(scope="session")
def aeam_file():
    return AEAM_FILE
