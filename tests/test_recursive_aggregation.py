"""Aggregation-layer tests: host aggregate vs circuit, AggregatedProof
serialization, structural determinism of dummy-witness synthesis."""

import io
import random

import pytest

from plonkit_tpu.api import SetupForProver, verify
from plonkit_tpu.backend import HostBackend
from plonkit_tpu.fields import FR_MODULUS as R
from plonkit_tpu.recursive.aggregation import (AggregatedProof,
                                               build_aggregation_circuit,
                                               compute_aggregate, derive_rho,
                                               dummy_proof,
                                               expected_aggregated_input)
from plonkit_tpu.serialization import Proof


def _inner(srs, k=24, seed=7):
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from scratch.agg_smoke import rich_inner_circuit
    c = rich_inner_circuit(k=k, seed=seed)
    setup = SetupForProver(c, srs, backend=HostBackend())
    vk = setup.make_verification_key()
    proof = setup.prove(c, "rescue")
    assert verify(vk, proof, "rescue")
    return vk, proof, setup, c


def test_derive_rho_deterministic_and_binding(srs):
    vk, proof, _, _ = _inner(srs)
    r1 = derive_rho(vk, proof)
    r2 = derive_rho(vk, proof)
    assert r1 == r2
    proof.input_values[0] = (proof.input_values[0] + 1) % R
    assert derive_rho(vk, proof) != r1


def test_compute_aggregate_rejects_bad_proof(srs):
    vk, proof, _, _ = _inner(srs)
    assert compute_aggregate(vk, [proof]) is not None
    bad = Proof(**{f: getattr(proof, f) for f in (
        "n", "num_inputs", "input_values", "wire_commitments",
        "grand_product_commitment", "quotient_poly_commitments",
        "wire_values_at_z", "wire_values_at_z_omega",
        "grand_product_at_z_omega", "quotient_polynomial_at_z",
        "linearization_polynomial_at_z", "permutation_polynomials_at_z",
        "opening_at_z_proof", "opening_at_z_omega_proof")})
    bad.quotient_polynomial_at_z = (bad.quotient_polynomial_at_z + 1) % R
    assert compute_aggregate(vk, [bad]) is None
    assert expected_aggregated_input(vk, [bad]) is None


def test_aggregated_proof_serialization_roundtrip(srs):
    vk, proof, _, _ = _inner(srs)
    dummy_outer = dummy_proof(vk, seed=3)
    dummy_outer.num_inputs = 1
    dummy_outer.input_values = [12345]
    agg = AggregatedProof(proof=dummy_outer, vk_root=999,
                          aggr_limbs=list(range(16)),
                          individual_num_inputs=2,
                          individual_inputs=[7, 8])
    buf = io.BytesIO()
    agg.write(buf)
    buf.seek(0)
    agg2 = AggregatedProof.read(buf)
    assert agg2.vk_root == agg.vk_root
    assert agg2.aggr_limbs == agg.aggr_limbs
    assert agg2.individual_inputs == agg.individual_inputs
    assert agg2.proof.to_bytes() == agg.proof.to_bytes()


@pytest.mark.slow
def test_circuit_matches_host_aggregate(srs):
    """The synthesized circuit's limbs + public hash equal the host's."""
    vk, proof, _, _ = _inner(srs)
    cs, limbs = build_aggregation_circuit(vk, [proof])
    h, host_limbs = expected_aggregated_input(vk, [proof])
    assert limbs == host_limbs
    assert cs.public_inputs() == [h]


@pytest.mark.slow
def test_dummy_witness_synthesis_structure_matches_real(srs):
    """vk export synthesizes with garbage witnesses; the gate structure
    (selectors + wire indices + input count) must match a real synthesis
    exactly, else the exported recursive vk would not verify real
    aggregated proofs."""
    vk, proof, _, _ = _inner(srs)
    cs_real, _ = build_aggregation_circuit(vk, [proof])
    cs_dummy, _ = build_aggregation_circuit(vk, [dummy_proof(vk, seed=1)])
    assert cs_real.num_gates == cs_dummy.num_gates
    assert len(cs_real.input_vars) == len(cs_dummy.input_vars)
    assert cs_real.sels == cs_dummy.sels
    assert cs_real.wires == cs_dummy.wires
