"""Vectorized Montgomery field arithmetic for the TPU compute path.

Field elements are stored **planar**: shape [16, ...] uint32 arrays holding
sixteen 16-bit limbs (little-endian limb order, limb axis first so the batch
axis lands on TPU vector lanes).  Montgomery radix R = 2^256.

Why 16-bit limbs: the TPU VPU has no widening 32x32 multiply; 16x16->32
products are exact in uint32, and column sums of up to 64 such halves stay
well below 2^32, so schoolbook + SOS Montgomery reduction needs no exotic
carry handling (SURVEY §7 "hard parts" #3).

Ops are written limb-axis-vectorized (slice updates over the leading limb
axis rather than fully unrolled scalar graphs) to keep XLA graphs small; the
Pallas kernels in pallas_kernels.py implement the same math fused for the
hot paths.  Everything is verified against the host python-int oracle
(tests/test_tpu_field.py).
"""

import jax
import jax.numpy as jnp
import numpy as np

from ..fields import FQ_MODULUS, FR_MODULUS

NLIMBS = 16
LIMB_BITS = 16
MASK = (1 << LIMB_BITS) - 1


def _int_to_limbs(x: int) -> np.ndarray:
    return np.array([(x >> (LIMB_BITS * i)) & MASK for i in range(NLIMBS)], dtype=np.uint32)


class FieldSpec:
    """Montgomery constants for a 254-bit prime field."""

    def __init__(self, p: int):
        self.p = p
        self.r = 1 << (NLIMBS * LIMB_BITS)
        self.r_mod_p = self.r % p
        self.r2_mod_p = self.r * self.r % p
        # -p^-1 mod 2^16
        self.pprime = (-pow(p, -1, 1 << LIMB_BITS)) % (1 << LIMB_BITS)
        self.p_limbs = _int_to_limbs(p)
        self.one_mont_limbs = _int_to_limbs(self.r_mod_p)
        self.r2_limbs = _int_to_limbs(self.r2_mod_p)

    # -- host-side conversions (numpy) ------------------------------------

    def to_limbs_np(self, values) -> np.ndarray:
        """python ints (canonical) -> [16, N] uint32 raw limbs."""
        return self.to_limbs_np_u16(values).astype(np.uint32)

    def to_limbs_np_u16(self, values) -> np.ndarray:
        """python ints (canonical) -> [16, N] uint16 raw limbs (the
        minimal 32 B/element wire format: callers that ship limbs to a
        device push this and widen there, halving host->device bytes)."""
        n = len(values)
        buf = b"".join(int(v).to_bytes(32, "little") for v in values)
        arr = np.frombuffer(buf, dtype="<u2").reshape(n, NLIMBS)
        return np.ascontiguousarray(arr.T)

    def from_limbs_np(self, limbs) -> list:
        """[16, N] uint32 raw limbs -> python ints (canonical)."""
        arr = np.asarray(limbs, dtype=np.uint32).T.astype("<u2")  # [N, 16] u16
        data = arr.tobytes()
        return [int.from_bytes(data[32 * i:32 * (i + 1)], "little") for i in range(arr.shape[0])]

    def to_mont_np(self, values) -> np.ndarray:
        return self.to_limbs_np([int(v) * self.r_mod_p % self.p for v in values])

    def from_mont_np(self, limbs) -> list:
        inv_r = pow(self.r, -1, self.p)
        return [v * inv_r % self.p for v in self.from_limbs_np(limbs)]


FR = FieldSpec(FR_MODULUS)
FQ = FieldSpec(FQ_MODULUS)


# ---------------------------------------------------------------------------
# jnp ops -- operate on [16, ...] uint32, Montgomery form, canonical (< p)
# ---------------------------------------------------------------------------

def _carry16(limbs):
    """Propagate carries so every limb is < 2^16.  Input columns must be
    < 2^32; returns (canonical limbs, carry_out)."""
    out = []
    carry = jnp.zeros_like(limbs[0])
    for i in range(limbs.shape[0]):
        c = limbs[i] + carry
        out.append(c & MASK)
        carry = c >> LIMB_BITS
    return jnp.stack(out), carry


def _sub_with_borrow(a, b):
    """a - b limbwise (both canonical); returns (diff limbs, borrow flag)."""
    out = []
    borrow = jnp.zeros_like(a[0])
    for i in range(a.shape[0]):
        d = a[i] - b[i] - borrow
        borrow = d >> 31
        out.append(d & MASK)
    return jnp.stack(out), borrow


def _sub_p_limbs(spec, limbs):
    """limbs - p with scalar constants (pallas-friendly); (diff, borrow)."""
    out = []
    borrow = jnp.zeros_like(limbs[0])
    for i in range(NLIMBS):
        d = limbs[i] - jnp.uint32(int(spec.p_limbs[i])) - borrow
        borrow = d >> 31
        out.append(d & MASK)
    return jnp.stack(out), borrow


def _cond_sub_p(spec, limbs, force=None):
    """Subtract p where limbs >= p (or where force says so)."""
    subbed, borrow = _sub_p_limbs(spec, limbs)
    need = borrow == 0
    if force is not None:
        need = need | force
    return jnp.where(need[None], subbed, limbs)


def add(spec: FieldSpec, a, b):
    """(a + b) mod p."""
    s, _ = _carry16(a + b)  # no carry out: 2p < 2^255
    return _cond_sub_p(spec, s)


def sub(spec: FieldSpec, a, b):
    """(a - b) mod p."""
    d, borrow = _sub_with_borrow(a, b)
    added = []
    carry = jnp.zeros_like(a[0])
    for i in range(NLIMBS):
        c = d[i] + jnp.uint32(int(spec.p_limbs[i])) + carry
        added.append(c & MASK)
        carry = c >> LIMB_BITS
    return jnp.where((borrow > 0)[None], jnp.stack(added), d)


def neg(spec: FieldSpec, a):
    z = jnp.zeros_like(a)
    return jnp.where(is_zero(a)[None], z, sub(spec, z, a))


def _pvec(spec: "FieldSpec", ndim: int):
    """[16, 1, ...] modulus limb vector built from *scalar* constants
    (pallas kernels reject captured array constants); built once per traced
    kernel and amortized across every mul in it."""
    shape = (NLIMBS,) + (1,) * ndim
    rows = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    out = jnp.zeros(shape, dtype=jnp.uint32)
    for j in range(NLIMBS):
        out = jnp.where(rows == j, jnp.uint32(int(spec.p_limbs[j])), out)
    return out


def mont_mul(spec: FieldSpec, a, b):
    """Montgomery product a * b * R^-1 mod p (CIOS, 16-bit limbs).

    Formulated so every multiply/accumulate is a *dense* [16/17, batch] op:
    the SOS variant (`mont_mul_sos`) spends ~4x the VPU issue slots on
    single-sublane [batch]-shaped column adds (a [batch] op occupies 1/8 of
    each vreg), which made it the measured bottleneck of both the MSM sweep
    and the NTT butterfly.  Accumulator T is [17, batch] redundant (limbs
    < 2^23 — each iteration adds at most 4*(2^16-1) per limb and the
    limb-shift restarts growth), so uint32 never overflows."""
    batch_shape = a.shape[1:]
    z1 = jnp.zeros((1,) + batch_shape, dtype=jnp.uint32)
    pvec = _pvec(spec, len(batch_shape))
    pp = jnp.uint32(spec.pprime)

    T = jnp.zeros((NLIMBS + 1,) + batch_shape, dtype=jnp.uint32)
    for i in range(NLIMBS):
        prod = a[i][None] * b                       # [16, batch]
        T = (T
             + jnp.concatenate([prod & MASK, z1], axis=0)
             + jnp.concatenate([z1, prod >> LIMB_BITS], axis=0))
        m = ((T[0] & MASK) * pp) & MASK             # [batch]
        prod2 = m[None] * pvec                      # [16, batch]
        T = (T
             + jnp.concatenate([prod2 & MASK, z1], axis=0)
             + jnp.concatenate([z1, prod2 >> LIMB_BITS], axis=0))
        # shift down one limb; T[0] is divisible by 2^16 — its high part
        # carries into the new limb 0
        T = jnp.concatenate([(T[1] + (T[0] >> LIMB_BITS))[None], T[2:], z1],
                            axis=0)

    limbs, _ = _carry16(T[:NLIMBS])
    # T[16] is zero after the final shift (z1), and the redundant limbs
    # carry-resolve to a < 2p value that the ripple keeps inside 16 limbs.
    return _cond_sub_p(spec, limbs)


def mont_mul_sos(spec: FieldSpec, a, b):
    """Montgomery product a * b * R^-1 mod p (SOS, 16-bit limbs) — reference
    formulation, kept for differential testing of `mont_mul`.

    Column sums stay < 2^23 (32 mul halves + 32 reduction halves + carries),
    so uint32 accumulators never overflow."""
    batch_shape = a.shape[1:]
    batch_pad = ((0, 0),) * len(batch_shape)
    T = [jnp.zeros(batch_shape, dtype=jnp.uint32) for _ in range(2 * NLIMBS)]

    def acc(base_idx, vals):
        # T[base_idx + j] += vals[j] without scatter ops (slow to compile)
        for j in range(vals.shape[0]):
            T[base_idx + j] = T[base_idx + j] + vals[j]

    # schoolbook product, one limb of `a` at a time (limb-axis vectorized)
    for i in range(NLIMBS):
        prod = a[i][None] * b  # [16, ...]
        acc(i, prod & MASK)
        acc(i + 1, prod >> LIMB_BITS)
    # Montgomery reduction: zero out the low limbs one at a time
    pp = jnp.uint32(spec.pprime)
    p_scalars = [jnp.uint32(int(x)) for x in spec.p_limbs]
    for i in range(NLIMBS):
        m = ((T[i] & MASK) * pp) & MASK
        for j in range(NLIMBS):
            prod = m * p_scalars[j]
            T[i + j] = T[i + j] + (prod & MASK)
            T[i + j + 1] = T[i + j + 1] + (prod >> LIMB_BITS)
        T[i + 1] = T[i + 1] + (T[i] >> LIMB_BITS)
    limbs, _ = _carry16(jnp.stack(T[NLIMBS:]))
    return _cond_sub_p(spec, limbs)


def mont_sqr(spec: FieldSpec, a):
    return mont_mul(spec, a, a)


def to_mont(spec: FieldSpec, raw):
    r2 = jnp.broadcast_to(
        jnp.asarray(spec.r2_limbs, dtype=jnp.uint32).reshape((NLIMBS,) + (1,) * (raw.ndim - 1)),
        raw.shape)
    return mont_mul(spec, raw, r2)


def from_mont(spec: FieldSpec, m):
    one = jnp.zeros_like(m)
    one = one.at[0].set(1)
    return mont_mul(spec, m, one)


def is_zero(a):
    return jnp.all(a == 0, axis=0)


def eq(a, b):
    return jnp.all(a == b, axis=0)


def select(flag, a, b):
    """flag [...] selects a where true else b; limb arrays [16, ...]."""
    return jnp.where(flag[None], a, b)


def one_mont(spec: FieldSpec, shape=()):
    # built from per-limb *scalar* constants (not a captured [16] array) so
    # it is legal inside pallas kernel bodies, like the rest of this module
    limbs = jnp.stack([jnp.full(tuple(shape), int(l), dtype=jnp.uint32)
                       for l in spec.one_mont_limbs])
    return limbs


def zero(shape=()):
    return jnp.zeros((NLIMBS,) + tuple(shape), dtype=jnp.uint32)


def const_mont(spec: FieldSpec, value: int, shape=()):
    limbs = jnp.asarray(_int_to_limbs(value * spec.r_mod_p % spec.p), dtype=jnp.uint32)
    return jnp.broadcast_to(limbs.reshape((NLIMBS,) + (1,) * len(shape)), (NLIMBS,) + tuple(shape))


def mont_pow(spec: FieldSpec, base, exponent: int):
    """Fixed public exponent power; fori_loop keeps the graph to ~2 muls."""
    nbits = max(exponent.bit_length(), 1)
    ebits = jnp.asarray([(exponent >> i) & 1 for i in range(nbits)], dtype=jnp.uint32)

    def body(i, carry):
        acc, sq = carry
        mul_res = mont_mul(spec, acc, sq)
        acc = select(ebits[i] > 0, mul_res, acc)
        sq = mont_sqr(spec, sq)
        return acc, sq

    acc0 = jnp.broadcast_to(one_mont(spec, base.shape[1:]), base.shape)
    acc, _ = jax.lax.fori_loop(0, nbits, body, (acc0, base))
    return acc


def inverse(spec: FieldSpec, a):
    """Vectorized inversion via Fermat: a^(p-2); zero maps to zero."""
    return mont_pow(spec, a, spec.p - 2)
