"""Poseidon (circomlib semantics) — parameters, hash, circuit, and e2e prove.

The reference's flagship workload is circomlib Poseidon(2)
(test/circuits/poseidon/circuit.circom:1-14, circomlib 0.5.1 per
package.json:20).  Parameters here are generated from scratch (Grain LFSR
per the Poseidon paper's reference generator) and pinned against the
published circomlibjs test vectors, so these tests prove genuine circomlib
interoperability."""

import pytest

from plonkit_tpu.fields import FR_MODULUS as P
from plonkit_tpu.frontend.poseidon import (grain_parameters, poseidon,
                                           poseidon_circuit)


def test_circomlib_test_vectors():
    # circomlibjs test/poseidon.js
    assert poseidon([1, 2]) == \
        7853200120776062878684798364095072458815029376092732009249414926327459813530
    assert poseidon([1]) == \
        18586133768512220936620570745912940619677854269274689475585506675881198879027


def test_grain_parameter_anchors():
    # first round constant and MDS[0][0] of circomlib's t=3 tables
    C, M = grain_parameters(3)
    assert C[0] == 0x0EE9A592BA9A9518D05986D656F40C2114C4993C11BB29938D21D47304CD8E6E
    assert M[0][0] == 0x109B7F411BA0E4C9B2B70CAF5C36A7B194BE7C11AD24378BFEDB68592BA8118B
    assert len(C) == (8 + 57) * 3


def test_circuit_r1cs_satisfied():
    circ, out = poseidon_circuit(2, chain=1, inputs=[3, 4])
    assert out == poseidon([3, 4])
    assert len(circ.r1cs.constraints) == 244   # 81 sboxes * 3 + output bind
    w = circ.witness
    for a, b, c in circ.r1cs.constraints:
        av = sum(w[i] * v for i, v in a) % P
        bv = sum(w[i] * v for i, v in b) % P
        cv = sum(w[i] * v for i, v in c) % P
        assert av * bv % P == cv


def test_chain_scales():
    circ, out = poseidon_circuit(2, chain=3)
    # H(H(H(1,2), 1000), 1001)
    h = poseidon([1, 2])
    h = poseidon([h, 1000])
    h = poseidon([h, 1001])
    assert out == h
    assert circ.witness[1] == h


def test_poseidon_prove_verify_host():
    """Full pipeline on the flagship circuit: transpile -> setup -> prove ->
    verify against the checked-in dev SRS (mirrors the reference's
    test_poseidon_plonk.sh with SETUP_POWER shrunk to the committed 2^10
    key; the 2^20 run is scripts/bench_prove.py --poseidon)."""
    from plonkit_tpu.api import SetupForProver, verify
    from plonkit_tpu.serialization import Crs

    circ, out = poseidon_circuit(2, chain=1, inputs=[3, 4])
    # 2308 gates (fat LCs from circom-style linear-constraint elimination)
    # -> 2^12 domain; dev SRS via iterated small-scalar muls (tau = 42)
    from plonkit_tpu.curve import G1_GEN, G2_GEN, g1_mul, g2_mul
    g1 = [G1_GEN]
    for _ in range((1 << 12) + 3):
        g1.append(g1_mul(g1[-1], 42))
    crs = Crs(g1, [G2_GEN, g2_mul(G2_GEN, 42)])
    setup = SetupForProver(circ, crs)
    proof = setup.prove(circ)
    vk = setup.make_verification_key()
    assert verify(vk, proof)
    assert proof.input_values == [out]
    # tampered public input must not verify
    proof.input_values = [(out + 1) % P]
    assert not verify(vk, proof)
