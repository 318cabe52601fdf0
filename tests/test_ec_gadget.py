"""In-circuit EC gadgets vs host curve arithmetic."""

import random

import pytest

from plonkit_tpu.curve import G1_GEN, g1_add, g1_mul
from plonkit_tpu.fields import FQ_MODULUS as P, FR_MODULUS as R
from plonkit_tpu.plonk.extended import ProverError, validate_witness2
from plonkit_tpu.recursive.cs import CsBuilder
from plonkit_tpu.recursive.ec_gadget import (ec_add, ec_double, ec_msm,
                                             ec_multi_msm, ec_neg,
                                             point_alloc)

rng = random.Random(0xEC)


def check_satisfied(cs):
    validate_witness2(cs.setup(), cs.wire_columns(), cs.public_inputs())


def rand_point():
    return g1_mul(G1_GEN, rng.randrange(1, R))


def test_ec_add_double_match_host():
    cs = CsBuilder()
    p_pt, q_pt = rand_point(), rand_point()
    p = point_alloc(cs, p_pt)
    q = point_alloc(cs, q_pt)
    s = ec_add(cs, p, q)
    assert s.point == g1_add(p_pt, q_pt)
    d = ec_double(cs, p)
    assert d.point == g1_add(p_pt, p_pt)
    n = ec_neg(cs, q)
    assert n.point[1] % P == (P - q_pt[1]) % P
    check_satisfied(cs)


def test_point_alloc_rejects_off_curve():
    cs = CsBuilder()
    x, y = rand_point()
    with pytest.raises(AssertionError):
        point_alloc(cs, (x, (y + 1) % P))


def test_ec_msm_small_width_matches_host():
    cs = CsBuilder()
    pts = [rand_point() for _ in range(3)]
    scalars = [rng.randrange(1 << 32) for _ in range(3)]
    pairs = [(point_alloc(cs, pt), cs.alloc(s)) for pt, s in zip(pts, scalars)]
    out = ec_msm(cs, pairs, width=32)
    expected = None
    for pt, s in zip(pts, scalars):
        expected = g1_add(expected, g1_mul(pt, s))
    assert out.point == expected
    check_satisfied(cs)


def test_ec_multi_msm_two_groups():
    cs = CsBuilder()
    pts = [rand_point() for _ in range(3)]
    scalars = [rng.randrange(1 << 16) for _ in range(3)]
    g0 = [(point_alloc(cs, pts[0]), cs.alloc(scalars[0])),
          (point_alloc(cs, pts[1]), cs.alloc(scalars[1]))]
    g1_grp = [(point_alloc(cs, pts[2]), cs.alloc(scalars[2]))]
    out = ec_multi_msm(cs, [g0, g1_grp], width=16)
    assert out[0].point == g1_add(g1_mul(pts[0], scalars[0]),
                                  g1_mul(pts[1], scalars[1]))
    assert out[1].point == g1_mul(pts[2], scalars[2])
    check_satisfied(cs)


def test_ec_msm_zero_chunks_skipped():
    """Scalar with many zero windows exercises the select path."""
    cs = CsBuilder()
    pt = rand_point()
    s = 1 << 30   # single bit set
    out = ec_msm(cs, [(point_alloc(cs, pt), cs.alloc(s))], width=32)
    assert out.point == g1_mul(pt, s)
    check_satisfied(cs)


def test_ec_msm_tampered_result_unsatisfiable():
    cs = CsBuilder()
    pt = rand_point()
    out = ec_msm(cs, [(point_alloc(cs, pt), cs.alloc(0x1234))], width=16)
    setup = cs.setup()
    cols = cs.wire_columns()
    target = out.x.limbs[0].value
    for col in cols:
        for i, v in enumerate(col):
            if v == target:
                col[i] = (v + 1) % R
    with pytest.raises(ProverError):
        validate_witness2(setup, cols, cs.public_inputs())


@pytest.mark.slow
def test_ec_msm_full_width():
    cs = CsBuilder()
    pts = [rand_point() for _ in range(2)]
    scalars = [rng.randrange(R) for _ in range(2)]
    pairs = [(point_alloc(cs, pt), cs.alloc(s)) for pt, s in zip(pts, scalars)]
    out = ec_msm(cs, pairs, width=256)
    expected = g1_add(g1_mul(pts[0], scalars[0]), g1_mul(pts[1], scalars[1]))
    assert out.point == expected
    check_satisfied(cs)
