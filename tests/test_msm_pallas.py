"""The pallas MSM window vs the jnp window kernel on identical inputs
(reference behavior: bellman_ce multiexp, SURVEY D1c).

The Mosaic kernels only compile on TPU, and interpret-mode emulation on
XLA-CPU costs tens of minutes of compile per kernel variant (it made the
slow tier unrunnable three rounds in a row), so the pallas-vs-jnp
equivalence runs ON TPU ONLY — where it compiles in seconds — and is
additionally pinned at 2^20 against the native C++ Pippenger by
scratch/tpu_msm_check.py + the driver bench.  On the CPU test mesh these
tests skip and the jnp path is covered by tests/test_parallel_msm.py and
the golden e2e suite."""

import random

import jax
import jax.numpy as jnp
import pytest

from plonkit_tpu.curve import G1_GEN, g1_mul
from plonkit_tpu.fields import FR_MODULUS as R
from plonkit_tpu.tpu import ec
from plonkit_tpu.tpu.msm import _window_kernel, _window_pallas, digits_np

needs_tpu = pytest.mark.skipif(
    jax.default_backend() == "cpu",
    reason="Mosaic kernels need a TPU; interpret-mode XLA-CPU compile "
           "takes tens of minutes per variant")


def _setup(n, c, seed=3):
    rng = random.Random(seed)
    points = [g1_mul(G1_GEN, rng.randrange(1, R)) for _ in range(n)]
    scalars = [rng.randrange(R) for _ in range(n)]
    x, y, inf = ec.affine_from_host(points)
    W = -(-254 // c)
    digits = digits_np(scalars, c, W)
    return x, y, inf, digits, W


def _compare(x, y, inf, d, cfg):
    jx, jy, jz, jovf, jbad = _window_kernel(x, y, inf, d, **cfg)
    px, py, pz, povf, pbad = _window_pallas(x, y, inf, d, **cfg)
    assert bool(jovf) == bool(povf) and not bool(povf)
    assert bool(jbad) == bool(pbad) and not bool(pbad)
    want = ec.to_affine_host((jx, jy, jz))[0]
    got = ec.to_affine_host((px, py, pz))[0]
    assert got == want


@needs_tpu
@pytest.mark.slow
def test_window_pallas_matches_jnp_kernel():
    n, c = 64, 4
    x, y, inf, digits, W = _setup(n, c)
    cfg = dict(n=n, lanes=128, r_max=24, repl=1)
    _compare(x, y, inf, jnp.asarray(digits[1]), cfg)


@needs_tpu
@pytest.mark.slow
def test_window_pallas_top_window_repl():
    n, c = 64, 4
    x, y, inf, digits, W = _setup(n, c, seed=9)
    # top-window config with sub-lane replication; same sweep/padd variants
    cfg = dict(n=n, lanes=128, r_max=24, repl=4)
    _compare(x, y, inf, jnp.asarray(digits[W - 1]), cfg)
