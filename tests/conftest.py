import os
import sys

# Tests run on an 8-device virtual CPU mesh.  Under the axon TPU harness a
# sitecustomize already initialized jax on the axon backend before conftest
# runs, so setting env vars is not enough -- force the platform switch and
# re-create the backends (XLA_FLAGS is re-read when the CPU client is built).
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# persistent compilation cache: XLA-CPU compiles of the limb graphs are slow
jax.config.update("jax_compilation_cache_dir", os.path.join(_REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from jax.extend.backend import clear_backends  # noqa: E402

clear_backends()
assert jax.devices()[0].platform == "cpu"

sys.path.insert(0, _REPO)

import pytest

REFERENCE = "/root/reference"
SIMPLE = os.path.join(REFERENCE, "test/circuits/simple")
SRS_2_10 = os.path.join(REFERENCE, "keys/setup/setup_2^10.key")


@pytest.fixture(scope="session")
def simple_dir():
    return SIMPLE


@pytest.fixture(scope="session")
def srs_path():
    return SRS_2_10


@pytest.fixture(scope="session")
def srs():
    from plonkit_tpu.serialization import Crs
    return Crs.load(SRS_2_10)
