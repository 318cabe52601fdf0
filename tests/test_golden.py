"""Golden-file regression tests against the committed reference artifacts,
mirroring the reference's own unit-test strategy (src/tests.rs)."""

import json
import os

import pytest

from plonkit_tpu.frontend import CircomCircuit, load_r1cs, load_witness
from plonkit_tpu.frontend.transpiler import synthesize_witness, transpile
from plonkit_tpu.plonk.prover import prove
from plonkit_tpu.plonk.setup import make_setup_polynomials, make_verification_key
from plonkit_tpu.plonk.verifier import verify
from plonkit_tpu.serialization import Crs, Proof, VerificationKey


def _read(path):
    with open(path, "rb") as f:
        return f.read()


def test_artifact_roundtrip(simple_dir, srs_path):
    vk_bytes = _read(os.path.join(simple_dir, "vk.bin"))
    proof_bytes = _read(os.path.join(simple_dir, "proof.bin"))
    assert VerificationKey.load(os.path.join(simple_dir, "vk.bin")).to_bytes() == vk_bytes
    import io
    assert Proof.read(io.BytesIO(proof_bytes)).to_bytes() == proof_bytes
    crs = Crs.load(srs_path)
    buf = io.BytesIO()
    crs.write(buf)
    assert buf.getvalue() == _read(srs_path)


def test_srs_is_tau_42(srs):
    from plonkit_tpu.curve import G1_GEN, G2_GEN, g1_mul, g2_mul
    assert srs.g1_bases[0] == G1_GEN
    assert srs.g1_bases[1] == g1_mul(G1_GEN, 42)
    assert srs.g1_bases[5] == g1_mul(G1_GEN, 42 ** 5)
    assert srs.g2_monomial_bases[0] == G2_GEN
    assert srs.g2_monomial_bases[1] == g2_mul(G2_GEN, 42)


def test_analyse_matches_reference(simple_dir):
    # src/tests.rs:14 CIRCUIT_ANALYZE_RESULT
    r1cs = load_r1cs(os.path.join(simple_dir, "circuit.r1cs.json"))
    tc = transpile(CircomCircuit(r1cs=r1cs))
    assert r1cs.num_inputs == 2
    assert r1cs.num_aux == 2
    assert r1cs.num_variables == 4
    assert len(r1cs.constraints) == 2
    assert len(tc.constraint_stats) == 2
    assert tc.num_constraint_gates == 3
    assert len(tc.hints) == 2
    assert [(s.name, s.num_gates) for s in tc.constraint_stats] == [("0", 1), ("1", 2)]


def test_vk_bytes_match(simple_dir, srs):
    r1cs = load_r1cs(os.path.join(simple_dir, "circuit.r1cs.json"))
    tc = transpile(CircomCircuit(r1cs=r1cs))
    sp = make_setup_polynomials(tc)
    vk = make_verification_key(sp, srs)
    assert vk.to_bytes() == _read(os.path.join(simple_dir, "vk.bin"))


def test_proof_bytes_match(simple_dir, srs):
    c = CircomCircuit(
        r1cs=load_r1cs(os.path.join(simple_dir, "circuit.r1cs.json")),
        witness=load_witness(os.path.join(simple_dir, "witness.json")),
    )
    tc, cols, pub = synthesize_witness(c)
    sp = make_setup_polynomials(tc)
    proof = prove(sp, cols, pub, srs)
    assert proof.to_bytes() == _read(os.path.join(simple_dir, "proof.bin"))


def test_golden_proof_verifies(simple_dir):
    vk = VerificationKey.load(os.path.join(simple_dir, "vk.bin"))
    proof = Proof.load(os.path.join(simple_dir, "proof.bin"))
    assert verify(vk, proof)


def test_tampered_proof_rejected(simple_dir):
    vk = VerificationKey.load(os.path.join(simple_dir, "vk.bin"))
    proof = Proof.load(os.path.join(simple_dir, "proof.bin"))
    proof.input_values = [36]
    assert not verify(vk, proof)
