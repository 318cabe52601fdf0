"""Vectorized BN254 G1 arithmetic over Fq limb arrays (Jacobian coords).

Point batch representation: (X, Y, Z) tuple of [16, N] uint32 Montgomery
limb arrays; infinity encoded as Z == 0.  Formulas are the standard
Jacobian add/double with select-based handling of infinity and the
doubling case, so the group operation is complete over arbitrary inputs
(required by the scan-based MSM bucket reduction in msm.py).

Cost: general add ~16 muls + doubling fallback ~8 -> ~24 field muls per
lane; mixed (affine) add ~11+8.  The MSM hot path amortizes this across
the full vector width.
"""

import jax
import jax.numpy as jnp
import numpy as np

from . import mont
from .mont import FQ, NLIMBS

SPEC = FQ


def _mul(a, b):
    return mont.mont_mul(SPEC, a, b)


def _sqr(a):
    return mont.mont_mul(SPEC, a, a)


def _add(a, b):
    return mont.add(SPEC, a, b)


def _sub(a, b):
    return mont.sub(SPEC, a, b)


def _dbl_f(a):
    return mont.add(SPEC, a, a)


def infinity(n):
    z = jnp.zeros((NLIMBS, n), dtype=jnp.uint32)
    return (z, z, z)


def is_infinity(p):
    return mont.is_zero(p[2])


def select(flag, p, q):
    """flag [...]: p where true else q."""
    return tuple(jnp.where(flag[None], a, b) for a, b in zip(p, q))


def double(p):
    """dbl-2009-l: 3M + 5S (a=0 curve)."""
    X, Y, Z = p
    A = _sqr(X)
    B = _sqr(Y)
    C = _sqr(B)
    t = _sub(_sqr(_add(X, B)), _add(A, C))
    D = _dbl_f(t)                      # 2((X+B)^2 - A - C)
    E = _add(_dbl_f(A), A)             # 3A
    F = _sqr(E)
    X3 = _sub(F, _dbl_f(D))
    eight_c = _dbl_f(_dbl_f(_dbl_f(C)))
    Y3 = _sub(_mul(E, _sub(D, X3)), eight_c)
    Z3 = _dbl_f(_mul(Y, Z))
    return (X3, Y3, Z3)


def add(p, q):
    """Complete Jacobian + Jacobian addition (add-2007-bl + fallbacks)."""
    X1, Y1, Z1 = p
    X2, Y2, Z2 = q
    Z1Z1 = _sqr(Z1)
    Z2Z2 = _sqr(Z2)
    U1 = _mul(X1, Z2Z2)
    U2 = _mul(X2, Z1Z1)
    S1 = _mul(Y1, _mul(Z2, Z2Z2))
    S2 = _mul(Y2, _mul(Z1, Z1Z1))
    H = _sub(U2, U1)
    r = _sub(S2, S1)
    HH = _sqr(H)
    HHH = _mul(H, HH)
    V = _mul(U1, HH)
    X3 = _sub(_sub(_sqr(r), HHH), _dbl_f(V))
    Y3 = _sub(_mul(r, _sub(V, X3)), _mul(S1, HHH))
    Z3 = _mul(_mul(Z1, Z2), H)
    res = (X3, Y3, Z3)

    h_zero = mont.is_zero(H)
    r_zero = mont.is_zero(r)
    # same x: if also same y -> double, else result is infinity (Z3 = 0 already
    # since H = 0 forces Z3 = 0; but X3,Y3 are garbage -> normalize to inf)
    res = select(h_zero & r_zero, double(p), res)
    res = select(h_zero & ~r_zero, infinity(X1.shape[1]), res)
    res = select(is_infinity(p), q, res)
    res = select(is_infinity(q), p, res)
    return res


def add_mixed(p, q_affine):
    """Jacobian + affine (Z2 = 1): madd-2007-bl (~8M + 3S) with fallbacks.
    q_affine: (x, y, inf_flag)."""
    X1, Y1, Z1 = p
    X2, Y2, q_inf = q_affine
    Z1Z1 = _sqr(Z1)
    U2 = _mul(X2, Z1Z1)
    S2 = _mul(Y2, _mul(Z1, Z1Z1))
    H = _sub(U2, X1)
    r = _sub(S2, Y1)
    HH = _sqr(H)
    HHH = _mul(H, HH)
    V = _mul(X1, HH)
    X3 = _sub(_sub(_sqr(r), HHH), _dbl_f(V))
    Y3 = _sub(_mul(r, _sub(V, X3)), _mul(Y1, HHH))
    Z3 = _mul(Z1, H)
    res = (X3, Y3, Z3)

    h_zero = mont.is_zero(H)
    r_zero = mont.is_zero(r)
    res = select(h_zero & r_zero, double(p), res)
    res = select(h_zero & ~r_zero, infinity(X1.shape[1]), res)
    one = mont.one_mont(SPEC, (X1.shape[1],))
    lifted = (X2, Y2, jnp.where(q_inf[None], jnp.zeros_like(one), one))
    res = select(is_infinity(p), lifted, res)
    res = select(q_inf, p, res)
    return res


def add_mixed_unchecked(p, q_affine):
    """Jacobian + affine madd-2007-bl WITHOUT the doubling fallback
    (~11 field muls instead of ~19).  Returns (result, bad): `bad` flags
    lanes that hit the excluded P+P case (both finite, same x AND same y).
    Infinity of either operand is still exact (cheap selects); P+(-P)
    degenerates to Z3 = 0 which IS the infinity encoding.

    The MSM bucket accumulation adds distinct SRS bases (x-collisions are
    impossible among powers tau^i*G), so `bad` never fires there for honest
    inputs -- but it is checked on device and the caller falls back to the
    host MSM if it ever does (correctness first)."""
    X1, Y1, Z1 = p
    X2, Y2, q_inf = q_affine
    Z1Z1 = _sqr(Z1)
    U2 = _mul(X2, Z1Z1)
    S2 = _mul(Y2, _mul(Z1, Z1Z1))
    H = _sub(U2, X1)
    r = _sub(S2, Y1)
    HH = _sqr(H)
    HHH = _mul(H, HH)
    V = _mul(X1, HH)
    X3 = _sub(_sub(_sqr(r), HHH), _dbl_f(V))
    Y3 = _sub(_mul(r, _sub(V, X3)), _mul(Y1, HHH))
    Z3 = _mul(Z1, H)
    res = (X3, Y3, Z3)

    p_inf = is_infinity(p)
    finite = ~p_inf & ~q_inf
    bad = finite & mont.is_zero(H) & mont.is_zero(r)
    one = mont.one_mont(SPEC, (X1.shape[1],))
    lifted = (X2, Y2, jnp.where(q_inf[None], jnp.zeros_like(one), one))
    res = select(p_inf, lifted, res)
    res = select(q_inf, p, res)
    return res, bad


def add_unchecked(p, q):
    """Jacobian + Jacobian add-2007-bl WITHOUT the doubling fallback
    (~16 field muls instead of ~24).  Returns (result, bad) like
    add_mixed_unchecked; used by the MSM bucket reduction where operands
    are (sums of) distinct-base subsets and equality has negligible
    probability -- flagged on device, host fallback on trigger."""
    X1, Y1, Z1 = p
    X2, Y2, Z2 = q
    Z1Z1 = _sqr(Z1)
    Z2Z2 = _sqr(Z2)
    U1 = _mul(X1, Z2Z2)
    U2 = _mul(X2, Z1Z1)
    S1 = _mul(Y1, _mul(Z2, Z2Z2))
    S2 = _mul(Y2, _mul(Z1, Z1Z1))
    H = _sub(U2, U1)
    r = _sub(S2, S1)
    HH = _sqr(H)
    HHH = _mul(H, HH)
    V = _mul(U1, HH)
    X3 = _sub(_sub(_sqr(r), HHH), _dbl_f(V))
    Y3 = _sub(_mul(r, _sub(V, X3)), _mul(S1, HHH))
    Z3 = _mul(_mul(Z1, Z2), H)
    res = (X3, Y3, Z3)

    p_inf = is_infinity(p)
    q_inf = is_infinity(q)
    finite = ~p_inf & ~q_inf
    bad = finite & mont.is_zero(H) & mont.is_zero(r)
    res = select(p_inf, q, res)
    res = select(q_inf, p, res)
    return res, bad


def neg(p):
    X, Y, Z = p
    return (X, mont.neg(SPEC, Y), Z)


def to_affine_host(p):
    """Pull a [16, N] Jacobian batch to host affine python points."""
    from ..fields import FQ_MODULUS, fq_inv
    xs = SPEC.from_mont_np(np.asarray(p[0]))
    ys = SPEC.from_mont_np(np.asarray(p[1]))
    zs = SPEC.from_mont_np(np.asarray(p[2]))
    out = []
    for x, y, z in zip(xs, ys, zs):
        if z == 0:
            out.append(None)
            continue
        zi = fq_inv(z)
        zi2 = zi * zi % FQ_MODULUS
        out.append((x * zi2 % FQ_MODULUS, y * zi2 % FQ_MODULUS * zi % FQ_MODULUS))
    return out


def affine_from_host(points):
    """Host affine points -> ((x, y) Montgomery limb arrays, inf flags)."""
    xs = [0 if p is None else p[0] for p in points]
    ys = [0 if p is None else p[1] for p in points]
    infs = np.array([p is None for p in points], dtype=bool)
    return (jnp.asarray(SPEC.to_mont_np(xs)),
            jnp.asarray(SPEC.to_mont_np(ys)),
            jnp.asarray(infs))


def jacobian_from_affine(aff):
    x, y, inf = aff
    n = x.shape[1]
    one = mont.one_mont(SPEC, (n,))
    z = jnp.where(inf[None], jnp.zeros_like(one), one)
    zero = jnp.zeros_like(x)
    return (jnp.where(inf[None], zero, x), jnp.where(inf[None], zero, y), z)
