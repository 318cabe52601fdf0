import os
import sys

# multi-device CPU simulation for sharding tests; must be set before jax import
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
os.environ.setdefault("JAX_PLATFORMS", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

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
