"""Recursive verifier contract codegen: structural checks + on-chain
rescue-constant derivation equivalence (no solc in this image, so the
contract is validated by construction against verifier2/aggregation
semantics; the math sections mirror plonk/extended.py line for line)."""

from plonkit_tpu.recursive.rescue import ALPHA_INV, MDS, ROUND_CONSTANTS
from plonkit_tpu.solidity import render_recursive_verification_key


def _demo_vk2(srs):
    from plonkit_tpu.backend import HostBackend
    from plonkit_tpu.plonk.extended import make_verification_key2
    from tests.test_extended import build_demo_circuit
    cs = build_demo_circuit()
    return make_verification_key2(cs.setup(), srs, backend=HostBackend())


def test_render_recursive_contract(srs):
    vk2 = _demo_vk2(srs)
    sol = render_recursive_verification_key(None, vk2, 2)
    assert "{{" not in sol, "unresolved placeholders"
    assert "function verifyAggregatedProof" in sol
    assert "function rescue_hash" in sol
    assert "q_range" in sol
    assert str(ALPHA_INV) in sol
    for row in MDS:
        for v in row:
            assert str(v) in sol
    assert f"INDIVIDUAL_INPUTS = 2;" in sol
    assert str(vk2.domain_size) in sol
    # vk constants embedded
    x, y = vk2.range_selector_commitments[0]
    assert str(x) in sol and str(y) in sol


def test_onchain_rescue_constants_embedded(srs):
    """The contract bakes the franklin-derived round constants as literals
    (the Blake2s/ChaCha generation has no EVM builtin): every one of the
    45x3 constants must appear verbatim, and the sponge must specialize
    the capacity element to the input length."""
    vk2 = _demo_vk2(srs)
    sol = render_recursive_verification_key(None, vk2, 2)
    for i in range(45):
        for j in range(3):
            assert f"rc[{i}][{j}] = {ROUND_CONSTANTS[i][j]};" in sol, (i, j)
    assert "state[2] = n;" in sol
