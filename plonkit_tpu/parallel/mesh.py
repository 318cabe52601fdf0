"""Device mesh configuration for multi-chip proving.

The reference's only parallelism is a single-host CPU thread pool
(bellman worker::Worker, SURVEY §5.8); the TPU-native replacement is a 1-D
jax Mesh over which polynomials (the domain axis) and SRS points are
sharded.  Collectives ride ICI: all_to_all for NTT transposes, all_gather
for MSM window combination and cross-shard scan offsets."""

from functools import lru_cache

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

AXIS = "shard"


def make_mesh(n_devices: int = None) -> Mesh:
    devs = jax.devices()
    if n_devices is None:
        n_devices = len(devs)
    assert len(devs) >= n_devices, f"need {n_devices} devices, have {len(devs)}"
    return Mesh(np.array(devs[:n_devices]), (AXIS,))


def domain_sharding(mesh: Mesh) -> NamedSharding:
    """[16, n] limb arrays sharded along the domain axis."""
    return NamedSharding(mesh, P(None, AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
