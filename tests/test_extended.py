"""Extended gate system (plonk.extended): the better_better_cs analogue
used by the recursive aggregation circuit (SURVEY D1i).  Covers the
two-bit-decomposition range custom gate, gadget layer, prove2/verify2
round trip, vk2 serialization, and negative paths."""

import io
import random

import pytest

from plonkit_tpu.fields import FR_MODULUS as R
from plonkit_tpu.plonk.extended import (ProverError, VerificationKey2,
                                        make_verification_key2, prove2,
                                        validate_witness2, verify2)
from plonkit_tpu.recursive.cs import CsBuilder


def _backend():
    from plonkit_tpu.backend import HostBackend
    return HostBackend()


def build_demo_circuit(x_val=3, bad_wire=None):
    """public x; prove knowledge of y = x^3 + x + 5 with assorted gadgets
    plus range chains exercising the custom gate."""
    cs = CsBuilder()
    x = cs.alloc_input(x_val)
    x2 = cs.mul(x, x)
    x3 = cs.mul(x2, x)
    y = cs.lc([(x3, 1), (x, 1)], constant=5)
    cs.enforce_constant(y, (x_val ** 3 + x_val + 5) % R)

    # range chains (the custom gate): 8-bit, 16-bit, and chunk extraction
    v = cs.alloc(0xAB)
    cs.enforce_range(v, 8)
    w = cs.alloc(0xBEEF)
    chunks = cs.decompose_chunks(w, 16)
    assert len(chunks) == 8
    # chunks are MSB-first 2-bit values: recombine and compare
    recombined = 0
    for ch in chunks:
        recombined = 4 * recombined + ch.value
    assert recombined == 0xBEEF

    # booleans, select, inverse, div
    b = cs.boolean(1)
    sel = cs.select(b, x2, x3)
    cs.enforce_equal(sel, x2)
    inv = cs.inverse(x3)
    one = cs.mul(inv, x3)
    cs.enforce_constant(one, 1)
    q = cs.div(x3, x)
    cs.enforce_equal(q, x2)
    return cs


def test_extended_prove_verify_roundtrip(srs):
    cs = build_demo_circuit()
    setup = cs.setup()
    assert setup.domain_size <= 1024
    cols = cs.wire_columns()
    pub = cs.public_inputs()
    validate_witness2(setup, cols, pub)
    be = _backend()
    vk = make_verification_key2(setup, srs, backend=be)
    proof = prove2(setup, cols, pub, crs=srs, backend=be)
    assert verify2(vk, proof)
    # determinism
    proof_again = prove2(setup, cols, pub, crs=srs, backend=be)
    assert proof.to_bytes() == proof_again.to_bytes()


def test_extended_rejects_tampered_witness(srs):
    cs = build_demo_circuit()
    setup = cs.setup()
    cols = cs.wire_columns()
    pub = cs.public_inputs()
    # find a row whose range selector is on and corrupt its c-cell
    row = next(i for i, s in enumerate(setup.selectors[7]) if s)
    cols[2][row] = (cols[2][row] + 7) % R
    with pytest.raises(ProverError):
        validate_witness2(setup, cols, pub)
    with pytest.raises(ProverError):
        prove2(setup, cols, pub, crs=srs, backend=_backend())


def test_extended_rejects_wrong_public_input(srs):
    cs = build_demo_circuit()
    setup = cs.setup()
    cols = cs.wire_columns()
    pub = cs.public_inputs()
    be = _backend()
    vk = make_verification_key2(setup, srs, backend=be)
    proof = prove2(setup, cols, pub, crs=srs, backend=be)
    proof.input_values[0] = (proof.input_values[0] + 1) % R
    assert not verify2(vk, proof)


def test_extended_rejects_cross_transcript(srs):
    cs = build_demo_circuit()
    setup = cs.setup()
    be = _backend()
    vk = make_verification_key2(setup, srs, backend=be)
    proof = prove2(setup, cs.wire_columns(), cs.public_inputs(), crs=srs,
                   backend=be, transcript="rescue")
    assert verify2(vk, proof, transcript="rescue")
    assert not verify2(vk, proof, transcript="keccak")


def test_vk2_serialization_roundtrip(srs):
    cs = build_demo_circuit()
    setup = cs.setup()
    vk = make_verification_key2(setup, srs, backend=_backend())
    buf = io.BytesIO()
    vk.write(buf)
    buf.seek(0)
    vk2 = VerificationKey2.read(buf)
    assert vk2.n == vk.n
    assert vk2.selector_commitments == vk.selector_commitments
    assert vk2.range_selector_commitments == vk.range_selector_commitments
    assert vk2.permutation_commitments == vk.permutation_commitments
    assert vk2.g2_elements == vk.g2_elements


def test_range_chain_soundness_bits(srs):
    """A witness claiming a too-wide value in a chain cell must fail."""
    cs = CsBuilder()
    x = cs.alloc_input(1)
    v = cs.alloc(0x3FF)          # 10 bits
    cs.enforce_range(v, 16)      # OK at 16 bits
    setup = cs.setup()
    cols = cs.wire_columns()
    validate_witness2(setup, cols, cs.public_inputs())
    # now pretend the same chain holds a 17-bit value: tamper the final
    # landing cell (and the variable everywhere it appears)
    big = 1 << 16
    for col in cols:
        for i, val in enumerate(col):
            if val == 0x3FF:
                col[i] = big
    with pytest.raises(ProverError):
        validate_witness2(setup, cols, cs.public_inputs())


def test_fast_validator_matches_row_validator(srs):
    from plonkit_tpu.plonk.extended import validate_witness2_fast
    cs = build_demo_circuit()
    setup = cs.setup()
    cols = cs.wire_columns()
    pub = cs.public_inputs()
    validate_witness2(setup, cols, pub)
    validate_witness2_fast(setup, cols, pub, backend=_backend())
    row = next(i for i, s in enumerate(setup.selectors[7]) if s)
    cols[2][row] = (cols[2][row] + 7) % R
    with pytest.raises(ProverError):
        validate_witness2_fast(setup, cols, pub, backend=_backend())
