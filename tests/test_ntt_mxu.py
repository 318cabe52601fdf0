"""MXU (matmul) NTT vs the host oracle and the Pease pipeline.

Mirrors the reference's FFT correctness surface (bellman_ce fft, SURVEY
D1d) the same way tests/test_tpu_field.py pins mont.py: small domains,
random canonical inputs, exact equality."""

import random

import jax.numpy as jnp
import numpy as np
import pytest

from plonkit_tpu.fields import FR_MODULUS, fr_inv, get_domain_omega
from plonkit_tpu.tpu import ntt as ntt_mod
from plonkit_tpu.tpu import ntt_mxu
from plonkit_tpu.tpu.mont import FR


def _host_ntt(vals, inverse=False):
    n = len(vals)
    omega = get_domain_omega(n)
    if inverse:
        omega = fr_inv(omega)
    out = []
    for j in range(n):
        acc = 0
        w = pow(omega, j, FR_MODULUS)
        cur = 1
        for i in range(n):
            acc = (acc + vals[i] * cur) % FR_MODULUS
            cur = cur * w % FR_MODULUS
        out.append(acc)
    if inverse:
        ninv = fr_inv(n)
        out = [v * ninv % FR_MODULUS for v in out]
    return out


@pytest.mark.parametrize("n", [16, 64, 256, 1024])
@pytest.mark.parametrize("inverse", [False, True])
def test_mxu_ntt_matches_host(n, inverse):
    rng = random.Random(42 + n)
    vals = [rng.randrange(FR_MODULUS) for _ in range(n)]
    x = jnp.asarray(FR.to_mont_np(vals))
    got = FR.from_mont_np(np.asarray(ntt_mxu.ntt_mxu(x, inverse=inverse)))
    if n <= 256:
        assert got == _host_ntt(vals, inverse)
    # cross-check against the Pease pipeline at every size
    ref = FR.from_mont_np(np.asarray(ntt_mod.ntt(x, inverse=inverse)))
    assert got == ref


def test_mxu_roundtrip_and_radix_plan():
    assert ntt_mxu.plan_radices(1 << 20) == (128, 128, 64)
    assert ntt_mxu.plan_radices(1 << 10) == (32, 32)
    assert ntt_mxu.plan_radices(1 << 24) == (256, 256, 256)
    rng = random.Random(7)
    n = 512
    vals = [rng.randrange(FR_MODULUS) for _ in range(n)]
    x = jnp.asarray(FR.to_mont_np(vals))
    back = FR.from_mont_np(np.asarray(
        ntt_mxu.intt_mxu(ntt_mxu.ntt_mxu(x))))
    assert back == vals


def test_mxu_coset_lde_matches_pease():
    rng = random.Random(9)
    n = 256
    vals = [rng.randrange(FR_MODULUS) for _ in range(n)]
    x = jnp.asarray(FR.to_mont_np(vals))
    got = FR.from_mont_np(np.asarray(ntt_mxu.coset_lde_mxu(x, 4)))
    ref = FR.from_mont_np(np.asarray(ntt_mod.coset_lde(x, 4)))
    assert got == ref


@pytest.mark.slow
def test_mxu_big_domain_matches_pease():
    """2^17 domain (radix plan with cached big tables) vs the Pease
    engine — pins the multi-stage/table path that the 2^20 prove runs,
    which the fast tier's n<=1024 cases never reach (VERDICT r3 weak #5).
    Uses random canonical values; equality is in canonical ints."""
    n = 1 << 17
    rng = np.random.default_rng(17)
    raw = rng.integers(0, 1 << 16, size=(16, n), dtype=np.uint32)
    raw[15] = 0          # keep values < 2^240 < r (canonical)
    x = jnp.asarray(raw)
    got = np.asarray(ntt_mxu.ntt_mxu(x))
    ref = np.asarray(ntt_mod.ntt(x))
    assert np.array_equal(got, ref)
    back = np.asarray(ntt_mxu.intt_mxu(jnp.asarray(got)))
    assert np.array_equal(back, raw)


def test_split_coset_transforms_match_monolithic():
    """The workspace-bounded split paths (backend_jax._coset_lde_split /
    _coset_intt_split, used at >=2^24 elements where a monolithic
    transform's stage workspaces OOM a 16 GiB v5e next to the quotient
    accumulators) must agree element-wise with the monolithic transforms
    at any size."""
    import random

    from plonkit_tpu.backend_jax import JaxBackend
    from plonkit_tpu.fields import FR_GENERATOR, FR_MODULUS as R

    b = JaxBackend()
    rng = random.Random(11)
    n = 256
    v = b.from_ints([rng.randrange(R) for _ in range(n)])

    lde_ref = b.coset_lde(v, 4)
    lde_split = b._coset_lde_split(v, 4, FR_GENERATOR)
    assert b.to_ints(lde_ref) == b.to_ints(lde_split)

    m_ref = b.coset_intt(lde_ref)
    m_split = b._coset_intt_split(lde_ref, 4, FR_GENERATOR)
    assert b.to_ints(m_ref) == b.to_ints(m_split)
    # round-trip: first n monomial coefficients recover v, rest vanish
    back = b.to_ints(m_split)
    assert back[:n] == b.to_ints(v)
    assert not any(back[n:])
