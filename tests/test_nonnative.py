"""Differential + soundness tests for the RNS non-native Fq gadgets
(recursive/nonnative.py) against host Fq arithmetic."""

import random

import pytest

from plonkit_tpu.fields import FQ_MODULUS as P, FR_MODULUS as R
from plonkit_tpu.plonk.extended import ProverError, validate_witness2
from plonkit_tpu.recursive.cs import CsBuilder
from plonkit_tpu.recursive.nonnative import (FqNum, fq_add, fq_alloc,
                                             fq_constant, fq_enforce_equal,
                                             fq_enforce_zero, fq_mul, fq_neg,
                                             fq_scale, fq_sub)

rng = random.Random(0xF00D)


def check_satisfied(cs):
    validate_witness2(cs.setup(), cs.wire_columns(), cs.public_inputs())


def test_fq_mul_fresh_output():
    cs = CsBuilder()
    for _ in range(4):
        a_v, b_v = rng.randrange(P), rng.randrange(P)
        a, b = fq_alloc(cs, a_v), fq_alloc(cs, b_v)
        out = fq_mul(cs, a, b)
        assert out.value % P == a_v * b_v % P
        assert out.value < P  # fresh outputs are canonical
    check_satisfied(cs)


def test_fq_mul_enforce_expected():
    cs = CsBuilder()
    a_v, b_v = rng.randrange(P), rng.randrange(P)
    a, b = fq_alloc(cs, a_v), fq_alloc(cs, b_v)
    expected = fq_alloc(cs, a_v * b_v % P)
    assert fq_mul(cs, a, b, expected=expected) is None
    check_satisfied(cs)


def test_fq_mul_enforce_lazy_expected():
    """expected built from add/sub (lazy limbs, value offset by s*p)."""
    cs = CsBuilder()
    a_v, b_v = rng.randrange(P), rng.randrange(P)
    x_v = rng.randrange(P)
    a, b = fq_alloc(cs, a_v), fq_alloc(cs, b_v)
    x = fq_alloc(cs, x_v)
    y = fq_alloc(cs, (a_v * b_v + x_v) % P)
    lazy = fq_sub(cs, y, x)          # === a*b (mod p), limbs lazy
    assert lazy.value % P == a_v * b_v % P
    fq_mul(cs, a, b, expected=lazy)
    check_satisfied(cs)


def test_fq_add_sub_neg_scale_chain():
    cs = CsBuilder()
    a_v, b_v = rng.randrange(P), rng.randrange(P)
    a, b = fq_alloc(cs, a_v), fq_alloc(cs, b_v)
    s = fq_add(cs, a, b)
    d = fq_sub(cs, a, b)
    n = fq_neg(cs, b)
    k = fq_scale(cs, a, 3)
    assert s.value % P == (a_v + b_v) % P
    assert d.value % P == (a_v - b_v) % P
    assert n.value % P == (-b_v) % P
    assert k.value % P == 3 * a_v % P
    # (a+b) * (a-b) == a^2 - b^2
    lhs = fq_mul(cs, s, d)
    a2 = fq_mul(cs, a, a)
    b2 = fq_mul(cs, b, b)
    rhs = fq_sub(cs, a2, b2)
    fq_enforce_equal(cs, lhs, rhs)
    check_satisfied(cs)


def test_fq_enforce_zero_on_multiple_of_p():
    cs = CsBuilder()
    a = fq_alloc(cs, rng.randrange(P))
    d = fq_sub(cs, a, a)      # value = s*p exactly
    fq_enforce_zero(cs, d)
    check_satisfied(cs)


def test_fq_mul_soundness_tampered_product():
    """Corrupting the product output wire must break satisfiability."""
    cs = CsBuilder()
    a_v, b_v = 12345, 67890
    a, b = fq_alloc(cs, a_v), fq_alloc(cs, b_v)
    out = fq_mul(cs, a, b)
    setup = cs.setup()
    cols = cs.wire_columns()
    check_satisfied(cs)
    # tamper the lowest output limb everywhere it appears
    target = out.limbs[0].value
    found = False
    for col in cols:
        for i, v in enumerate(col):
            if v == target:
                col[i] = (v + 1) % R
                found = True
    assert found
    with pytest.raises(ProverError):
        validate_witness2(setup, cols, cs.public_inputs())


def test_fq_gate_cost_budget():
    """Regression guard on gadget cost: one fresh fq_mul must stay under
    180 rows (current design ~135: 10 limb muls + q/r range chains +
    carries + native residue)."""
    cs = CsBuilder()
    a = fq_alloc(cs, rng.randrange(P))
    b = fq_alloc(cs, rng.randrange(P))
    before = cs.num_gates
    fq_mul(cs, a, b)
    cost = cs.num_gates - before
    assert cost < 180, cost
