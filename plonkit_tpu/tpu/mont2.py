"""Sublane-vectorized Montgomery multiplication (CIOS) for Pallas kernels.

`mont.mont_mul` (SOS) accumulates through ~32 separate single-sublane
[batch] adds per limb iteration; on the VPU (8x128 tiles) a [batch]-shaped
op uses one sublane row, i.e. 1/8 of the unit.  This CIOS formulation keeps
the accumulator as a [NLIMBS+1, batch] array and does every multiply /
accumulate as a full [16, batch] (2-tile) op with *constant* sublane
offsets: per limb iteration one a_i*b product, one m*p product, four
[17, batch] adds, and a shift-down-by-one-limb of the accumulator.

Same contract as mont.mont_mul: 16-bit limbs in uint32, canonical (< p)
Montgomery-form inputs/outputs.  Column bound: each iteration adds at most
4*(2^16-1) to a limb and the shift restarts growth, so limbs stay < 2^23 —
uint32 never overflows (cf. mont.mont_mul's bound comment).

Reference behavior: pairing_ce Montgomery arithmetic (SURVEY D1a); this is
a performance re-expression, validated against mont.mont_mul elementwise.
"""

import jax
import jax.numpy as jnp

from . import mont
from .mont import MASK, LIMB_BITS, NLIMBS


def _pvec(spec: mont.FieldSpec, ndim: int):
    """[16, 1, ...] modulus limb vector built from *scalar* constants
    (pallas kernels reject captured array constants); built once per traced
    kernel, amortized across every mul in it."""
    shape = (NLIMBS,) + (1,) * ndim
    rows = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    out = jnp.zeros(shape, dtype=jnp.uint32)
    for j in range(NLIMBS):
        out = jnp.where(rows == j, jnp.uint32(int(spec.p_limbs[j])), out)
    return out


def mont_mul_cios(spec: mont.FieldSpec, a, b, pvec=None):
    """Montgomery product a * b * R^-1 mod p; a, b: [16, ...] uint32."""
    batch_shape = a.shape[1:]
    z1 = jnp.zeros((1,) + batch_shape, dtype=jnp.uint32)
    if pvec is None:
        pvec = _pvec(spec, len(batch_shape))
    pp = jnp.uint32(spec.pprime)

    # T: [17, batch] redundant accumulator (limbs < 2^23)
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

    limbs, _ = mont._carry16(T[:NLIMBS])
    # result < 2p: top carry lands in T[16] only transiently; after the
    # final shift above the live value fits 16 limbs once carried.  The
    # carry16 above drops nothing because T[16] is zero by construction
    # (the last shift's z1) and the 255-bit bound keeps the ripple inside.
    return mont._cond_sub_p(spec, limbs)
