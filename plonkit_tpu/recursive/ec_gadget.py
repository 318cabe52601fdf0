"""In-circuit BN254 G1 arithmetic over non-native Fq limbs: affine
add/double and a shared-doubling Straus multi-scalar-multiplication.

Reference counterpart: franklin-crypto's aux_data/point gadgets driving the
in-circuit proof verification of the aggregation circuit (SURVEY D2c/D3).
Affine coordinates are the right in-circuit representation: field inversion
is witness + one mul-enforce, so an add is 3 multiplications instead of
Jacobian's ~11.

Soundness notes:
  * every allocated point is curve-checked (y^2 = x^3 + 3);
  * ec_add enforces x1 != x2 via an inverse witness -- without it the
    doubling case would leave lambda unconstrained and the prover could
    steer the aggregate to any point (negligible completeness loss:
    honest Straus traversal hits x-collisions with cryptographically
    small probability);
  * scalar decomposition reuses the range-chain 2-bit chunks; decomposing
    a canonical Fr scalar to 256 bits is unambiguous up to +r, and +r
    shifts the result by r*P = infinity, i.e. not at all;
  * identity points are not representable (affine) -- the accumulator is
    offset by a fixed point O and 2^bits * O is subtracted at the end, the
    standard completeness fix.
"""

from typing import List, Optional, Sequence, Tuple

from ..curve import G1_GEN, g1_mul, g1_neg
from ..fields import FQ_MODULUS as P, FR_MODULUS as R
from ..keccak import keccak256
from .cs import CsBuilder, Num
from .nonnative import (FqNum, NLIMBS, fq_add, fq_alloc, fq_constant,
                        fq_enforce_zero, fq_mul, fq_neg, fq_scale, fq_sub)


class PointG:
    """Affine G1 point gadget (never the identity)."""
    __slots__ = ("x", "y", "point")

    def __init__(self, x: FqNum, y: FqNum, point: Tuple[int, int]):
        self.x = x
        self.y = y
        self.point = point     # host-side (x, y) for witness computation


def _find_offset_point():
    """Fixed nothing-up-my-sleeve offset: G1_GEN * keccak(tag)."""
    k = int.from_bytes(keccak256(b"plonkit-tpu/straus-offset/v1"), "big") % R
    return g1_mul(G1_GEN, k)


OFFSET_POINT = _find_offset_point()


def point_alloc(cs: CsBuilder, pt: Tuple[int, int], check_curve: bool = True) -> PointG:
    assert pt is not None, "cannot allocate the identity in affine gadgets"
    x = fq_alloc(cs, pt[0])
    y = fq_alloc(cs, pt[1])
    g = PointG(x, y, pt)
    if check_curve:
        enforce_on_curve(cs, g)
    return g


def point_from_coords(cs: CsBuilder, x: FqNum, y: FqNum,
                      check_curve: bool = True) -> PointG:
    g = PointG(x, y, (x.value % P, y.value % P))
    if check_curve:
        enforce_on_curve(cs, g)
    return g


def point_constant(cs: CsBuilder, pt: Tuple[int, int]) -> PointG:
    return PointG(fq_constant(cs, pt[0]), fq_constant(cs, pt[1]), pt)


def enforce_on_curve(cs: CsBuilder, p: PointG):
    """y^2 - x^3 - 3 === 0 (mod p)."""
    y2 = fq_mul(cs, p.y, p.y)
    x2 = fq_mul(cs, p.x, p.x)
    rhs = fq_sub(cs, y2, fq_constant(cs, 3))
    fq_mul(cs, x2, p.x, expected=rhs)


def _host_add(p, q):
    (x1, y1), (x2, y2) = p, q
    assert x1 != x2, "affine add degenerate (x collision)"
    lam = (y2 - y1) * pow(x2 - x1, -1, P) % P
    x3 = (lam * lam - x1 - x2) % P
    y3 = (lam * (x1 - x3) - y1) % P
    return x3, y3, lam


def _host_double(p):
    x1, y1 = p
    assert y1 != 0
    lam = 3 * x1 * x1 * pow(2 * y1, -1, P) % P
    x3 = (lam * lam - 2 * x1) % P
    y3 = (lam * (x1 - x3) - y1) % P
    return x3, y3, lam


def ec_add(cs: CsBuilder, p: PointG, q: PointG) -> PointG:
    """p + q, affine; enforces x_p != x_q."""
    x3v, y3v, lamv = _host_add(p.point, q.point)
    dx = fq_sub(cs, q.x, p.x)
    dy = fq_sub(cs, q.y, p.y)
    # x1 != x2: dx * inv(dx) == 1
    inv = fq_alloc(cs, pow(dx.value % P, -1, P))
    fq_mul(cs, dx, inv, expected=fq_constant(cs, 1))
    lam = fq_alloc(cs, lamv)
    fq_mul(cs, lam, dx, expected=dy)
    x3 = fq_alloc(cs, x3v)
    fq_mul(cs, lam, lam, expected=fq_add(cs, fq_add(cs, x3, p.x), q.x))
    y3 = fq_alloc(cs, y3v)
    fq_mul(cs, lam, fq_sub(cs, p.x, x3), expected=fq_add(cs, y3, p.y))
    return PointG(x3, y3, (x3v, y3v))


def ec_double(cs: CsBuilder, p: PointG) -> PointG:
    x3v, y3v, lamv = _host_double(p.point)
    lam = fq_alloc(cs, lamv)
    x2 = fq_mul(cs, p.x, p.x)
    fq_mul(cs, lam, fq_scale(cs, p.y, 2), expected=fq_scale(cs, x2, 3))
    x3 = fq_alloc(cs, x3v)
    fq_mul(cs, lam, lam, expected=fq_add(cs, fq_add(cs, x3, p.x), p.x))
    y3 = fq_alloc(cs, y3v)
    fq_mul(cs, lam, fq_sub(cs, p.x, x3), expected=fq_add(cs, y3, p.y))
    return PointG(x3, y3, (x3v, y3v))


def ec_neg(cs: CsBuilder, p: PointG) -> PointG:
    return PointG(p.x, fq_neg(cs, p.y), (p.point[0], (-p.point[1]) % P))


class _MuxTable:
    """Per-point window table [P, 2P, 3P] with per-limb deltas
    precomputed once, so each window mux is 2 mul_adds per limb."""

    def __init__(self, cs: CsBuilder, p: PointG):
        p2 = ec_double(cs, p)
        p3 = ec_add(cs, p2, p)
        self.entries = [p, p2, p3]
        self.cs = cs
        # limb lists: x0..x3, y0..y3 per entry
        self.e_limbs = [e.x.limbs + e.y.limbs for e in self.entries]
        self.e_bounds = [e.x.bounds + e.y.bounds for e in self.entries]
        self.d21 = [cs.lc([(b, 1), (a, R - 1)])
                    for a, b in zip(self.e_limbs[0], self.e_limbs[1])]
        self.d32 = [cs.lc([(b, 1), (a, R - 1)])
                    for a, b in zip(self.e_limbs[1], self.e_limbs[2])]

    def mux(self, b0: Num, b1: Num, bb: Num) -> PointG:
        """entry for chunk in {0->P(garbage), 1->P, 2->2P, 3->3P}:
        m = E1 + b1*(E2-E1) + bb*(E3-E2)."""
        cs = self.cs
        limbs = []
        for i in range(2 * NLIMBS):
            t = cs.mul_add(b1, self.d21[i], self.e_limbs[0][i])
            limbs.append(cs.mul_add(bb, self.d32[i], t))
        bounds = [max(b[i] for b in self.e_bounds) for i in range(2 * NLIMBS)]
        chunk = b0.value + 2 * b1.value
        pt = self.entries[max(chunk, 1) - 1].point
        x = FqNum(limbs[:NLIMBS], bounds[:NLIMBS],
                  sum(n.value << (68 * i) for i, n in enumerate(limbs[:NLIMBS])))
        y = FqNum(limbs[NLIMBS:], bounds[NLIMBS:],
                  sum(n.value << (68 * i) for i, n in enumerate(limbs[NLIMBS:])))
        return PointG(x, y, pt)


def _select_point(cs: CsBuilder, flag: Num, p: PointG, q: PointG) -> PointG:
    """flag ? p : q, limb-wise."""
    limbs = []
    for a, b in zip(p.x.limbs + p.y.limbs, q.x.limbs + q.y.limbs):
        limbs.append(cs.select(flag, a, b))
    bounds = [max(a, b) for a, b in zip(p.x.bounds + p.y.bounds,
                                        q.x.bounds + q.y.bounds)]
    pt = p.point if flag.value else q.point
    x = FqNum(limbs[:NLIMBS], bounds[:NLIMBS],
              sum(n.value << (68 * i) for i, n in enumerate(limbs[:NLIMBS])))
    y = FqNum(limbs[NLIMBS:], bounds[NLIMBS:],
              sum(n.value << (68 * i) for i, n in enumerate(limbs[NLIMBS:])))
    return PointG(x, y, pt)


def ec_multi_msm(cs: CsBuilder, groups: Sequence[Sequence[Tuple[PointG, Num]]],
                 width: int = 256) -> List[PointG]:
    """Straus multi-MSM with shared window schedule: groups[k] is a list of
    (point, scalar) pairs; returns [sum_i s_i * P_i for each group].
    All scalars share one doubling ladder per group accumulator.  width is
    the scalar bit width (256 covers canonical Fr; the +r decomposition
    freedom is harmless since r*P = O)."""
    assert width % 8 == 0
    windows = width // 2

    # scalar chunk decomposition (MSB-first 2-bit chunks)
    all_chunks = []
    for group in groups:
        gch = []
        for pt, sc in group:
            assert sc.value < (1 << width), "scalar exceeds decomposition width"
            gch.append(cs.decompose_chunks(sc, width))
        all_chunks.append(gch)

    tables = [[_MuxTable(cs, pt) for pt, _ in group] for group in groups]

    accs = [point_constant(cs, OFFSET_POINT) for _ in groups]
    for w in range(windows):
        for k, group in enumerate(groups):
            accs[k] = ec_double(cs, ec_double(cs, accs[k]))
            for j, (pt, sc) in enumerate(group):
                ch = all_chunks[k][j][w]
                b0 = cs.boolean(ch.value & 1)
                b1 = cs.boolean((ch.value >> 1) & 1)
                cs.enforce_lc([(ch, 1), (b0, R - 1), (b1, R - 2)])
                bb = cs.mul(b0, b1)
                entry = tables[k][j].mux(b0, b1, bb)
                added = ec_add(cs, accs[k], entry)
                # nz = b0 + b1 - bb  (1 iff chunk != 0)
                nz = cs.lc([(b0, 1), (b1, 1), (bb, R - 1)])
                accs[k] = _select_point(cs, nz, added, accs[k])

    # subtract 2^width * O from each accumulator
    correction = g1_neg(g1_mul(OFFSET_POINT, pow(2, width, R)))
    out = []
    for acc in accs:
        corr = point_constant(cs, correction)
        out.append(ec_add(cs, acc, corr))
    return out


def ec_msm(cs: CsBuilder, pairs: Sequence[Tuple[PointG, Num]],
           width: int = 256) -> PointG:
    return ec_multi_msm(cs, [pairs], width=width)[0]
