"""Distributed MSM on the 8-device virtual CPU mesh vs the host oracle
(reference behavior: bellman_ce multiexp, SURVEY D1c; sharding per §5.8).

Both tests pad to the SAME sharded shape (n=256, D=8, c=8) so the
shard_map'd window program compiles once for the whole module — distinct
shapes each cost minutes of XLA-CPU compile (the round-3 slow-tier
timeout)."""

import random

import pytest

from plonkit_tpu.curve import G1_GEN, g1_mul, g1_msm_host
from plonkit_tpu.fields import FR_MODULUS as R
from plonkit_tpu.parallel.mesh import make_mesh
from plonkit_tpu.parallel.msm import DistributedMSMContext


def _bases(n, seed=5):
    rng = random.Random(seed)
    return [g1_mul(G1_GEN, rng.randrange(1, R)) for _ in range(n)]


@pytest.mark.slow  # XLA-CPU compile of the EC window body takes ~3 min cold
def test_distributed_msm_matches_host_oracle():
    n = 256
    rng = random.Random(11)
    points = _bases(n)
    scalars = [rng.randrange(R) for _ in range(n)]
    mesh = make_mesh(8)
    ctx = DistributedMSMContext(mesh, points, c=8)
    got = ctx.msm(scalars)
    want = g1_msm_host(points, scalars)
    assert got == want


@pytest.mark.slow
def test_distributed_msm_unpadded_and_sparse():
    # non-multiple-of-D length (pads with infinity up to the SAME n=256
    # compiled shape) + structured 0/1 selector-style scalars
    n = 250
    rng = random.Random(12)
    points = _bases(n, seed=7)
    scalars = [rng.randrange(2) for _ in range(n)]
    mesh = make_mesh(8)
    ctx = DistributedMSMContext(mesh, points, c=8)
    assert ctx.n == 256
    got = ctx.msm(scalars)
    want = g1_msm_host(points, scalars)
    assert got == want
