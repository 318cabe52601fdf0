"""Correctness tests for the TPU limb-arithmetic stack against the host
python-int oracle.  Run on the CPU backend (conftest sets JAX_PLATFORMS=cpu);
Pallas kernels run in interpret mode."""

import random

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from plonkit_tpu.fields import FQ_MODULUS, FR_MODULUS, get_domain_omega
from plonkit_tpu.plonk import poly_host
from plonkit_tpu.tpu import mont

INTERP = True


def rand_elems(n, p, seed=0):
    rng = random.Random(seed)
    vals = [rng.randrange(p) for _ in range(max(n - 4, 0))]
    return (vals + [0, 1, p - 1, p - 2])[:n]


@pytest.mark.parametrize("spec,p", [(mont.FR, FR_MODULUS), (mont.FQ, FQ_MODULUS)])
def test_mont_roundtrip(spec, p):
    xs = rand_elems(32, p)
    limbs = spec.to_mont_np(xs)
    assert spec.from_mont_np(limbs) == xs
    raw = spec.to_limbs_np(xs)
    assert spec.from_limbs_np(raw) == xs


@pytest.mark.parametrize("spec,p", [(mont.FR, FR_MODULUS), (mont.FQ, FQ_MODULUS)])
def test_mont_ops(spec, p):
    xs = rand_elems(32, p, seed=1)
    ys = rand_elems(32, p, seed=2)
    a = jnp.asarray(spec.to_mont_np(xs))
    b = jnp.asarray(spec.to_mont_np(ys))
    assert spec.from_mont_np(np.asarray(mont.add(spec, a, b))) == [(x + y) % p for x, y in zip(xs, ys)]
    assert spec.from_mont_np(np.asarray(mont.sub(spec, a, b))) == [(x - y) % p for x, y in zip(xs, ys)]
    assert spec.from_mont_np(np.asarray(mont.mont_mul(spec, a, b))) == [x * y % p for x, y in zip(xs, ys)]
    assert spec.from_mont_np(np.asarray(mont.neg(spec, a))) == [(-x) % p for x in xs]


def test_mont_inverse():
    p = FR_MODULUS
    xs = rand_elems(16, p, seed=3)
    a = jnp.asarray(mont.FR.to_mont_np(xs))
    got = mont.FR.from_mont_np(np.asarray(mont.inverse(mont.FR, a)))
    assert got == [pow(x, -1, p) if x else 0 for x in xs]


def test_pallas_kernels_interpret():
    from plonkit_tpu.tpu import pallas_kernels as pk
    p = FR_MODULUS
    xs = rand_elems(256, p, seed=4)
    ys = rand_elems(256, p, seed=5)
    a = jnp.asarray(mont.FR.to_mont_np(xs))
    b = jnp.asarray(mont.FR.to_mont_np(ys))
    assert mont.FR.from_mont_np(np.asarray(pk.mul(mont.FR, a, b, interpret=True))) == \
        [x * y % p for x, y in zip(xs, ys)]
    lo, hi = pk.butterfly_dif(mont.FR, a, b, a, interpret=True)
    assert mont.FR.from_mont_np(np.asarray(lo)) == [(x + y) % p for x, y in zip(xs, ys)]
    assert mont.FR.from_mont_np(np.asarray(hi)) == [(x - y) * x % p for x, y in zip(xs, ys)]


@pytest.mark.parametrize("n", [
    8, 64,
    pytest.param(512, marks=pytest.mark.slow),  # ~110s in interpret mode
])
def test_device_ntt(n):
    from plonkit_tpu.tpu import ntt as tntt
    p = FR_MODULUS
    vals = rand_elems(n, p, seed=6)
    dev = jnp.asarray(mont.FR.to_mont_np(vals))
    got = mont.FR.from_mont_np(np.asarray(tntt.ntt(dev, interpret=INTERP)))
    assert got == poly_host.ntt(list(vals))
    got_i = mont.FR.from_mont_np(np.asarray(tntt.intt(dev, interpret=INTERP)))
    assert got_i == poly_host.intt(list(vals))


def test_device_coset_lde():
    from plonkit_tpu.tpu import ntt as tntt
    p = FR_MODULUS
    n = 64
    vals = rand_elems(n, p, seed=7)
    dev = jnp.asarray(mont.FR.to_mont_np(vals))
    got = mont.FR.from_mont_np(np.asarray(tntt.coset_lde(dev, 4, interpret=INTERP)))
    assert got == poly_host.coset_ntt(list(vals) + [0] * (3 * n))


def test_ec_ops():
    from plonkit_tpu.tpu import ec
    from plonkit_tpu.curve import G1_GEN, g1_add, g1_mul, g1_double, g1_neg
    pts = [g1_mul(G1_GEN, k) for k in [1, 2, 3, 5, 7, 11]] + [None, G1_GEN]
    qts = [g1_mul(G1_GEN, k) for k in [9, 2, 8, 5, 1, 4]] + [G1_GEN, None]
    a = ec.jacobian_from_affine(ec.affine_from_host(pts))
    b = ec.jacobian_from_affine(ec.affine_from_host(qts))
    got = ec.to_affine_host(ec.add(a, b))
    want = [g1_add(x, y) for x, y in zip(pts, qts)]
    assert got == want
    got_d = ec.to_affine_host(ec.double(a))
    assert got_d == [g1_double(x) for x in pts]
    got_m = ec.to_affine_host(ec.add_mixed(a, ec.affine_from_host(qts)))
    assert got_m == want
    # doubling case via add (equal inputs)
    got_dd = ec.to_affine_host(ec.add(a, a))
    assert got_dd == [g1_double(x) for x in pts]
    # cancellation: P + (-P) = infinity
    negs = [g1_neg(x) for x in pts]
    c = ec.jacobian_from_affine(ec.affine_from_host(negs))
    got_z = ec.to_affine_host(ec.add(a, c))
    assert got_z == [None] * len(pts)
