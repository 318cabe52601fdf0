"""Flat-limb Fq arithmetic + G1 formulas for the MSM sweep kernel.

Layout: a field element batch is a LIST of 16 uint32 arrays, each of shape
[8, C] — limb i occupies its own full 8-sublane vector register slice, and
the batch spans (8 sublanes) x (C lanes).  Compare mont.py's planar
[16, batch]: there the per-limb rows the EC formulas slice out are
1-sublane-high [batch] vectors, so every elementwise op runs at 1/8 VPU
width, and the CIOS accumulator shift is a jnp.concatenate (a Mosaic
sublane shuffle).  In the flat layout limbs are separate Python values:
no concatenates, every op is a full [8, C] vreg op.  Measured (scratch/
ubench_flatmul.py, slope-timed on v5e): 0.46 ns per field mul*elem vs
~1.0 ns planar-in-kernel and ~5 ns in the planar sweep.

Only what the MSM sweep needs lives here: mul/add/sub/neg/select/is_zero
and the unchecked mixed add.  Semantics mirror mont.py / ec.py exactly
(same CIOS, same canonical-form invariants); tests drive both against the
host oracle on identical inputs.

Reference behavior: bellman_ce G1 Jacobian ops (SURVEY D1a/D1c).
"""

import jax
import jax.numpy as jnp

from .mont import FQ, NLIMBS

MASK = 0xFFFF
_PP = int(FQ.pprime)
_P = [int(v) for v in FQ.p_limbs]
_ONE = [int(v) for v in FQ.one_mont_limbs]


def f_zero_like(a):
    return [jnp.zeros_like(a[0]) for _ in range(NLIMBS)]


def f_mul(a, b):
    """Montgomery product (CIOS, 16x16-bit limbs), canonical in/out."""
    T = [jnp.zeros_like(a[0]) for _ in range(NLIMBS + 1)]
    for i in range(NLIMBS):
        ai = a[i]
        for j in range(NLIMBS):
            prod = ai * b[j]
            T[j] = T[j] + (prod & MASK)
            T[j + 1] = T[j + 1] + (prod >> 16)
        m = ((T[0] & MASK) * jnp.uint32(_PP)) & MASK
        for j in range(NLIMBS):
            prod = m * jnp.uint32(_P[j])
            T[j] = T[j] + (prod & MASK)
            T[j + 1] = T[j + 1] + (prod >> 16)
        T = [T[1] + (T[0] >> 16)] + T[2:] + [jnp.zeros_like(a[0])]
    out = []
    carry = jnp.zeros_like(a[0])
    for i in range(NLIMBS):
        c = T[i] + carry
        out.append(c & MASK)
        carry = c >> 16
    return _cond_sub_p(out)


def f_sqr(a):
    return f_mul(a, a)


def _cond_sub_p(limbs):
    sub = []
    borrow = jnp.zeros_like(limbs[0])
    for i in range(NLIMBS):
        d = limbs[i] - jnp.uint32(_P[i]) - borrow
        borrow = d >> 31
        sub.append(d & MASK)
    need = borrow == 0
    return [jnp.where(need, s, o) for s, o in zip(sub, limbs)]


def f_add(a, b):
    out = []
    carry = jnp.zeros_like(a[0])
    for i in range(NLIMBS):
        c = a[i] + b[i] + carry
        out.append(c & MASK)
        carry = c >> 16
    return _cond_sub_p(out)


def f_dbl(a):
    return f_add(a, a)


def f_sub(a, b):
    diff = []
    borrow = jnp.zeros_like(a[0])
    for i in range(NLIMBS):
        d = a[i] - b[i] - borrow
        borrow = d >> 31
        diff.append(d & MASK)
    # add p back where borrowed
    added = []
    carry = jnp.zeros_like(a[0])
    for i in range(NLIMBS):
        c = diff[i] + jnp.uint32(_P[i]) + carry
        added.append(c & MASK)
        carry = c >> 16
    need = borrow > 0
    return [jnp.where(need, x, d) for x, d in zip(added, diff)]


def f_neg(a):
    """p - a; correct for a != 0 (callers mask the a == 0 case)."""
    out = []
    borrow = jnp.zeros_like(a[0])
    for i in range(NLIMBS):
        d = jnp.uint32(_P[i]) - a[i] - borrow
        borrow = d >> 31
        out.append(d & MASK)
    z = f_is_zero(a)
    return [jnp.where(z, jnp.zeros_like(o), o) for o in out]


def f_is_zero(a):
    acc = a[0]
    for x in a[1:]:
        acc = acc | x
    return acc == 0


def f_select(flag, a, b):
    """flag [8, C] bool: a where true else b."""
    return [jnp.where(flag, x, y) for x, y in zip(a, b)]


def f_one(shape_like):
    return [jnp.full_like(shape_like, v) for v in _ONE]


def add_unchecked(p, q):
    """Jacobian + Jacobian without the doubling fallback (~16 field muls),
    flat-limb form; mirrors ec.add_unchecked.  Used for the in-kernel
    sub-accumulator folds.  Returns (result, bad)."""
    X1, Y1, Z1 = p
    X2, Y2, Z2 = q
    Z1Z1 = f_sqr(Z1)
    Z2Z2 = f_sqr(Z2)
    U1 = f_mul(X1, Z2Z2)
    U2 = f_mul(X2, Z1Z1)
    S1 = f_mul(Y1, f_mul(Z2, Z2Z2))
    S2 = f_mul(Y2, f_mul(Z1, Z1Z1))
    H = f_sub(U2, U1)
    r = f_sub(S2, S1)
    HH = f_sqr(H)
    HHH = f_mul(H, HH)
    V = f_mul(U1, HH)
    X3 = f_sub(f_sub(f_sqr(r), HHH), f_dbl(V))
    Y3 = f_sub(f_mul(r, f_sub(V, X3)), f_mul(S1, HHH))
    Z3 = f_mul(f_mul(Z1, Z2), H)

    p_inf = f_is_zero(Z1)
    q_inf = f_is_zero(Z2)
    finite = ~p_inf & ~q_inf
    bad = finite & f_is_zero(H) & f_is_zero(r)
    X3 = f_select(p_inf, X2, X3)
    Y3 = f_select(p_inf, Y2, Y3)
    Z3 = f_select(p_inf, Z2, Z3)
    X3 = f_select(q_inf, X1, X3)
    Y3 = f_select(q_inf, Y1, Y3)
    Z3 = f_select(q_inf, Z1, Z3)
    return (X3, Y3, Z3), bad


def add_mixed_unchecked(p, qx, qy, q_inf):
    """Jacobian (3 limb-lists) + affine (2 limb-lists, inf mask) without the
    doubling fallback — 11 field muls.  Mirrors ec.add_mixed_unchecked:
    returns (result, bad) where bad flags the excluded finite P+P case."""
    X1, Y1, Z1 = p
    Z1Z1 = f_sqr(Z1)
    U2 = f_mul(qx, Z1Z1)
    S2 = f_mul(qy, f_mul(Z1, Z1Z1))
    H = f_sub(U2, X1)
    r = f_sub(S2, Y1)
    HH = f_sqr(H)
    HHH = f_mul(H, HH)
    V = f_mul(X1, HH)
    X3 = f_sub(f_sub(f_sqr(r), HHH), f_dbl(V))
    Y3 = f_sub(f_mul(r, f_sub(V, X3)), f_mul(Y1, HHH))
    Z3 = f_mul(Z1, H)

    p_inf = f_is_zero(Z1)
    finite = ~p_inf & ~q_inf
    bad = finite & f_is_zero(H) & f_is_zero(r)
    one = f_one(qx[0])
    zero = jnp.zeros_like(qx[0])
    lifted_z = [jnp.where(q_inf, zero, v) for v in one]
    X3 = f_select(p_inf, qx, X3)
    Y3 = f_select(p_inf, qy, Y3)
    Z3 = f_select(p_inf, lifted_z, Z3)
    X3 = f_select(q_inf, X1, X3)
    Y3 = f_select(q_inf, Y1, Y3)
    Z3 = f_select(q_inf, Z1, Z3)
    return (X3, Y3, Z3), bad
