"""Differential tests: native BN254 library vs the pure-python oracles."""

import os
import random

import pytest

from plonkit_tpu import native
from plonkit_tpu.curve import (G1_GEN, G2_GEN, g1_msm_host, g1_mul, g1_neg,
                               g2_mul)
from plonkit_tpu.fields import FR_MODULUS as R
from plonkit_tpu.keccak import keccak256

pytestmark = pytest.mark.skipif(native.get_lib() is None,
                                reason="native library unavailable")


def test_keccak_differential():
    rng = random.Random(0)
    for n in [0, 1, 31, 32, 135, 136, 137, 500]:
        data = bytes(rng.randrange(256) for _ in range(n))
        assert native.keccak256_native(data) == keccak256(data)


def test_pairing_bilinearity():
    assert native.pairing_check_native([(G1_GEN, G2_GEN), (g1_neg(G1_GEN), G2_GEN)])
    assert not native.pairing_check_native([(G1_GEN, G2_GEN), (G1_GEN, G2_GEN)])
    assert native.pairing_check_native(
        [(g1_mul(G1_GEN, 2), G2_GEN), (g1_neg(G1_GEN), G2_GEN), (g1_neg(G1_GEN), G2_GEN)])
    rng = random.Random(7)
    a, b = rng.randrange(1, R), rng.randrange(1, R)
    assert native.pairing_check_native(
        [(g1_mul(G1_GEN, a), g2_mul(G2_GEN, b)),
         (g1_neg(g1_mul(G1_GEN, a * b % R)), G2_GEN)])


def test_msm_differential():
    rng = random.Random(3)
    pts = [g1_mul(G1_GEN, rng.randrange(1, 10 ** 9)) for _ in range(100)] + [None]
    scs = [rng.randrange(R) for _ in range(100)] + [5]
    scs[3] = 0
    got = native.msm_native(pts, scs)
    assert got is not False
    assert got == g1_msm_host(pts, scs)
    # all-zero scalars -> infinity
    assert native.msm_native(pts, [0] * len(pts)) is None


def test_native_verify_uses_golden(simple_dir):
    from plonkit_tpu.plonk.verifier import verify
    from plonkit_tpu.serialization import Proof, VerificationKey
    vk = VerificationKey.load(os.path.join(simple_dir, "vk.bin"))
    proof = Proof.load(os.path.join(simple_dir, "proof.bin"))
    import time
    t0 = time.time()
    assert verify(vk, proof)
    assert time.time() - t0 < 1.0, "native pairing path should be fast"
