"""Host-side BN254 optimal ate pairing (pure python).

Used only for O(1)-per-proof verification work (2 pairings per PLONK verify,
SURVEY D1a notes the pairing can stay host-side).  Implementation follows the
classic single-variable Fq12 = Fq[w]/(w^12 - 18 w^6 + 82) formulation (the
same representation py_ecc popularized for Ethereum's bn128 precompiles);
product-of-pairings checks share one final exponentiation.

Verified against the EVM precompile semantics: pairing_check returns True iff
prod e(P_i, Q_i) == 1, matching contrib/template.sol:228-253.
"""

from .fields import FQ_MODULUS as Q, FR_MODULUS

# BN parameter u: q = 36u^4 + 36u^3 + 24u^2 + 6u + 1
BN_U = 4965661367192848881
ATE_LOOP_COUNT = 6 * BN_U + 2  # 29793968203157093288

# Fq12 modulus polynomial w^12 - 18 w^6 + 82  ->  w^12 = 18 w^6 - 82
_FQ12_MOD_COEFFS = (82, 0, 0, 0, 0, 0, -18, 0, 0, 0, 0, 0)


def _fq12_mul(a, b):
    # schoolbook 12x12 then reduce by w^12 = 18 w^6 - 82
    t = [0] * 23
    for i, ai in enumerate(a):
        if ai:
            for j, bj in enumerate(b):
                t[i + j] += ai * bj
    for i in range(22, 11, -1):
        ti = t[i]
        if ti:
            t[i - 6] += ti * 18
            t[i - 12] -= ti * 82
    return tuple(x % Q for x in t[:12])


def _fq12_sq(a):
    return _fq12_mul(a, a)


_FQ12_ONE = (1,) + (0,) * 11


def _fq12_pow(a, e):
    result = _FQ12_ONE
    base = a
    while e:
        if e & 1:
            result = _fq12_mul(result, base)
        base = _fq12_sq(base)
        e >>= 1
    return result


def _fq12_inv(a):
    # extended euclid over Fq[w] against the modulus polynomial
    lm, hm = [1] + [0] * 12, [0] * 13
    low = list(a) + [0]
    high = [-c for c in _FQ12_MOD_COEFFS] + [1]  # monic modulus as poly of deg 12
    # high = w^12 - 18w^6 + 82 with sign convention: coeffs listed low->high
    high = [82, 0, 0, 0, 0, 0, -18, 0, 0, 0, 0, 0, 1]
    while _deg(low):
        r = _poly_rounded_div(high, low)
        nm = hm[:]
        new = high[:]
        for i in range(13):
            for j in range(13 - i):
                if r[j]:
                    nm[i + j] -= lm[i] * r[j]
                    new[i + j] -= low[i] * r[j]
        nm = [x % Q for x in nm]
        new = [x % Q for x in new]
        lm, low, hm, high = nm, new, lm, low
    inv_l0 = pow(low[0], -1, Q)
    return tuple(x * inv_l0 % Q for x in lm[:12])


def _deg(p):
    d = len(p) - 1
    while d and p[d] == 0:
        d -= 1
    return d


def _poly_rounded_div(a, b):
    dega, degb = _deg(a), _deg(b)
    temp = list(a)
    o = [0] * len(a)
    inv_b = pow(b[degb], -1, Q)
    for i in range(dega - degb, -1, -1):
        o[i] += temp[degb + i] * inv_b
        for c in range(degb + 1):
            temp[c + i] -= o[c]
    return [x % Q for x in o]


# Embed Fq2 (c0 + c1*u, u^2 = -1, xi = 9 + u) into the single-variable Fq12:
# u corresponds to (w^6 - 9), so  c0 + c1*u  ->  (c0 - 9 c1) + c1 * w^6

def _fq2_to_fq12(x):
    c0, c1 = x
    out = [0] * 12
    out[0] = (c0 - 9 * c1) % Q
    out[6] = c1 % Q
    return tuple(out)


_W2 = tuple(1 if i == 2 else 0 for i in range(12))  # w^2
_W3 = tuple(1 if i == 3 else 0 for i in range(12))  # w^3


def _twist(pt):
    """Map a G2 point (Fq2 coords) to E(Fq12) via the twist isomorphism."""
    if pt is None:
        return None
    x, y = pt
    return (_fq12_mul(_fq2_to_fq12(x), _W2), _fq12_mul(_fq2_to_fq12(y), _W3))


def _g1_to_fq12(pt):
    if pt is None:
        return None
    x, y = pt
    return ((x % Q,) + (0,) * 11, (y % Q,) + (0,) * 11)


def _fq12_add(a, b):
    return tuple((x + y) % Q for x, y in zip(a, b))


def _fq12_sub(a, b):
    return tuple((x - y) % Q for x, y in zip(a, b))


def _fq12_scalar(a, s):
    return tuple(x * s % Q for x in a)


_FQ12_ZERO = (0,) * 12


def _ec12_double(p):
    x, y = p
    m = _fq12_mul(_fq12_mul(_fq12_sq(x), (3,) + (0,) * 11), _fq12_inv(_fq12_add(y, y)))
    x3 = _fq12_sub(_fq12_sq(m), _fq12_add(x, x))
    y3 = _fq12_sub(_fq12_mul(m, _fq12_sub(x, x3)), y)
    return (x3, y3)


def _ec12_add(p, q):
    if p is None:
        return q
    if q is None:
        return p
    x1, y1 = p
    x2, y2 = q
    if x1 == x2:
        if y1 == y2:
            return _ec12_double(p)
        return None
    m = _fq12_mul(_fq12_sub(y2, y1), _fq12_inv(_fq12_sub(x2, x1)))
    x3 = _fq12_sub(_fq12_sub(_fq12_sq(m), x1), x2)
    y3 = _fq12_sub(_fq12_mul(m, _fq12_sub(x1, x3)), y1)
    return (x3, y3)


def _linefunc(p1, p2, t):
    x1, y1 = p1
    x2, y2 = p2
    xt, yt = t
    if x1 != x2:
        m = _fq12_mul(_fq12_sub(y2, y1), _fq12_inv(_fq12_sub(x2, x1)))
        return _fq12_sub(_fq12_mul(m, _fq12_sub(xt, x1)), _fq12_sub(yt, y1))
    elif y1 == y2:
        m = _fq12_mul(_fq12_mul(_fq12_sq(x1), (3,) + (0,) * 11), _fq12_inv(_fq12_add(y1, y1)))
        return _fq12_sub(_fq12_mul(m, _fq12_sub(xt, x1)), _fq12_sub(yt, y1))
    else:
        return _fq12_sub(xt, x1)


def _fq12_frobenius(a):
    """x -> x^q on the single-variable representation (generic powering of w)."""
    # w^q = w * (w^12)^((q-1)/12)? q ≡ 1 mod 6 but not mod 12; compute w^q by powering.
    # cached basis powers
    global _FROB_BASIS
    if _FROB_BASIS is None:
        wq = _fq12_pow((0, 1) + (0,) * 10, Q)
        basis = [_FQ12_ONE]
        for _ in range(11):
            basis.append(_fq12_mul(basis[-1], wq))
        _FROB_BASIS = basis
    out = _FQ12_ZERO
    for i, c in enumerate(a):
        if c:
            out = _fq12_add(out, _fq12_scalar(_FROB_BASIS[i], c))
    return out


_FROB_BASIS = None


def miller_loop(g2_pt, g1_pt):
    """Miller loop for the optimal ate pairing; returns an unexponentiated Fq12."""
    if g1_pt is None or g2_pt is None:
        return _FQ12_ONE
    q_tw = _twist(g2_pt)
    p12 = _g1_to_fq12(g1_pt)
    r = q_tw
    f = _FQ12_ONE
    for i in range(ATE_LOOP_COUNT.bit_length() - 2, -1, -1):
        f = _fq12_mul(_fq12_sq(f), _linefunc(r, r, p12))
        r = _ec12_double(r)
        if ATE_LOOP_COUNT & (1 << i):
            f = _fq12_mul(f, _linefunc(r, q_tw, p12))
            r = _ec12_add(r, q_tw)
    # the two BN-specific frobenius steps
    q1 = (_fq12_frobenius(q_tw[0]), _fq12_frobenius(q_tw[1]))
    nq2 = (_fq12_frobenius(q1[0]), tuple((-c) % Q for c in _fq12_frobenius(q1[1])))
    f = _fq12_mul(f, _linefunc(r, q1, p12))
    r = _ec12_add(r, q1)
    f = _fq12_mul(f, _linefunc(r, nq2, p12))
    return f


_FINAL_EXP = (Q ** 12 - 1) // FR_MODULUS


def final_exponentiation(f):
    return _fq12_pow(f, _FINAL_EXP)


def pairing(g1_pt, g2_pt):
    """e(P, Q) for P in G1, Q in G2."""
    return final_exponentiation(miller_loop(g2_pt, g1_pt))


def pairing_check(pairs):
    """True iff prod e(P_i, Q_i) == 1 (EVM 0x08 precompile semantics).
    Uses the native BN254 library when available (~40x faster); this pure
    python path is the fallback and differential-test oracle."""
    from .native import pairing_check_native
    res = pairing_check_native(pairs)
    if res is not None:
        return res
    return pairing_check_py(pairs)


def pairing_check_py(pairs):
    f = _FQ12_ONE
    for g1_pt, g2_pt in pairs:
        f = _fq12_mul(f, miller_loop(g2_pt, g1_pt))
    return final_exponentiation(f) == _FQ12_ONE
