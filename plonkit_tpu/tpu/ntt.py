"""Radix-2 NTT over Fr on TPU (SURVEY §7 step 4, hot kernel #2).

Constant-geometry (Pease) formulation: every stage applies the same
data movement --

    u = y[:h] + y[h:]
    v = (y[:h] - y[h:]) * tw[t]        (DIF butterfly)
    y = interleave(u, v)               (y'[2i] = u[i], y'[2i+1] = v[i])

with per-stage twiddles tw[t][j] = w^(2^t * (j >> t)), finishing with one
bit-reversal gather.  Because all log2(n) stages have identical shapes, the
whole transform is a single lax.fori_loop over one fused Pallas butterfly --
one kernel compile per domain size, a tiny XLA graph, and no per-stage
dispatch overhead.

The multi-device (sharded) variant lives in plonkit_tpu/parallel/ and reuses
this kernel with an all-to-all transpose (Bailey 4-step decomposition).
"""

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

from ..fields import FR_MODULUS as R, FR_GENERATOR, fr_inv, get_domain_omega
from . import mont, pallas_kernels as pk
from .mont import FR, NLIMBS


@lru_cache(maxsize=None)
def _bitrev_indices(n: int) -> np.ndarray:
    bits = n.bit_length() - 1
    idx = np.arange(n, dtype=np.uint32)
    rev = np.zeros(n, dtype=np.uint32)
    for b in range(bits):
        rev |= ((idx >> b) & 1) << (bits - 1 - b)
    return rev


@lru_cache(maxsize=None)
def _powers_np(base: int, n: int) -> np.ndarray:
    out = [1] * n
    for i in range(1, n):
        out[i] = out[i - 1] * base % R
    return FR.to_mont_np(out)


def _ntt_impl(values, omega_pows, rev, n_inv_vec, n: int, inverse: bool, interpret: bool):
    """omega_pows: [16, n/2] Montgomery powers of the domain root.  Stages
    are unrolled (all share one kernel shape) so the stage-t Pease table
    tw[t][j] = omega^((j >> t) << t) becomes a static strided slice +
    broadcast-repeat -- pure layout ops, no runtime gathers (a per-stage
    gather measured ~100x slower than the butterfly itself at 2^20)."""
    log_n = n.bit_length() - 1
    half = n // 2

    y = values
    for t in range(log_n):
        y0 = y[:, :half]
        y1 = y[:, half:]
        distinct = omega_pows[:, :: 1 << t][:, : half >> t]       # [16, half/2^t]
        tw = jnp.repeat(distinct, 1 << t, axis=1, total_repeat_length=half)
        u, v = pk.butterfly_dif(FR, y0, y1, tw, interpret=interpret)
        y = jnp.stack([u, v], axis=-1).reshape(NLIMBS, n)

    y = jnp.take(y, rev, axis=1)
    if inverse:
        y = pk.mul(FR, y, jnp.broadcast_to(n_inv_vec, y.shape), interpret=interpret)
    return y


@lru_cache(maxsize=None)
def _ntt_jit(n: int, inverse: bool, interpret: bool):
    fn = jax.jit(partial(_ntt_impl, n=n, inverse=inverse, interpret=interpret))
    return fn


@lru_cache(maxsize=None)
def _ntt_tables(n: int, inverse: bool):
    """Device-resident per-size tables (uploaded once)."""
    omega = get_domain_omega(n)
    if inverse:
        omega = fr_inv(omega)
    omega_pows = jnp.asarray(_powers_np(omega, max(n // 2, 1)))
    rev = jnp.asarray(_bitrev_indices(n).astype(np.int32))
    n_inv_vec = jnp.asarray(FR.to_mont_np([fr_inv(n)]))
    return omega_pows, rev, n_inv_vec


def ntt(values, inverse: bool = False, interpret: bool = False):
    """values: [16, n] Montgomery limb array (natural order) -> evaluations
    (coefficients scaled by n^-1 if inverse)."""
    n = values.shape[1]
    if n == 1:
        return values
    omega_pows, rev, n_inv_vec = _ntt_tables(n, inverse)
    return _ntt_jit(n, inverse, interpret)(values, omega_pows, rev, n_inv_vec)


def intt(values, interpret: bool = False):
    return ntt(values, inverse=True, interpret=interpret)


# ---------------------------------------------------------------------------
# batched transforms (for the distributed 4-step NTT in plonkit_tpu/parallel)
# ---------------------------------------------------------------------------

def _ntt_batched_impl(values, omega_pows, rev, n_inv_vec, m: int, inverse: bool,
                      interpret: bool):
    """values: [16, m, B] -- length-m transforms along axis 1, batched over B.
    Same Pease constant-geometry structure; the butterfly kernel sees the
    flattened [16, (m/2)*B] array."""
    log_m = m.bit_length() - 1
    half = m // 2
    B = values.shape[2]
    js = jax.lax.broadcasted_iota(jnp.int32, (half,), 0)

    def stage(t, y):
        y0 = y[:, :half, :].reshape(NLIMBS, half * B)
        y1 = y[:, half:, :].reshape(NLIMBS, half * B)
        idx = (js >> t) << t
        tw = jnp.repeat(jnp.take(omega_pows, idx, axis=1)[:, :, None], B, axis=2)
        tw = tw.reshape(NLIMBS, half * B)
        u, v = pk.butterfly_dif(FR, y0, y1, tw, interpret=interpret)
        u = u.reshape(NLIMBS, half, B)
        v = v.reshape(NLIMBS, half, B)
        return jnp.stack([u, v], axis=2).reshape(NLIMBS, m, B)

    y = jax.lax.fori_loop(0, log_m, stage, values)
    y = jnp.take(y, rev, axis=1)
    if inverse:
        scale = jnp.broadcast_to(n_inv_vec.reshape(NLIMBS, 1), (NLIMBS, m * B))
        y = pk.mul(FR, y.reshape(NLIMBS, m * B), scale,
                   interpret=interpret).reshape(NLIMBS, m, B)
    return y


@lru_cache(maxsize=None)
def _ntt_batched_jit(m: int, inverse: bool, interpret: bool):
    return jax.jit(partial(_ntt_batched_impl, m=m, inverse=inverse, interpret=interpret))


def ntt_batched(values, inverse: bool = False, interpret: bool = False):
    """values: [16, m, B] -> length-m NTTs along axis 1 (batched over axis 2)."""
    m = values.shape[1]
    if m == 1:
        return values
    omega = get_domain_omega(m)
    if inverse:
        omega = fr_inv(omega)
    omega_pows = jnp.asarray(_powers_np(omega, max(m // 2, 1)))
    rev = jnp.asarray(_bitrev_indices(m).astype(np.int32))
    n_inv_vec = jnp.asarray(FR.to_mont_np([fr_inv(m)]))
    return _ntt_batched_jit(m, inverse, interpret)(values, omega_pows, rev, n_inv_vec)


@lru_cache(maxsize=8)
def _coset_pows(shift: int, n: int):
    """Device-resident shift-power table (the host ladder + upload costs
    ~0.5 s at 4M and was paid on EVERY coset transform; only a handful of
    (shift, n) pairs ever occur per prover)."""
    return jnp.asarray(_powers_np(shift, n))


def coset_scale(coeffs, shift: int, interpret: bool = False):
    """Multiply coefficient i by shift^i (for coset NTTs)."""
    n = coeffs.shape[1]
    pows = _coset_pows(shift, n)
    return pk.mul(FR, coeffs, pows, interpret=interpret)


def coset_ntt(coeffs, shift: int = FR_GENERATOR, interpret: bool = False):
    return ntt(coset_scale(coeffs, shift, interpret), interpret=interpret)


def coset_intt(values, shift: int = FR_GENERATOR, interpret: bool = False):
    c = intt(values, interpret=interpret)
    return coset_scale(c, fr_inv(shift), interpret=interpret)


def coset_lde(coeffs, factor: int, shift: int = FR_GENERATOR, interpret: bool = False):
    n = coeffs.shape[1]
    ext = jnp.zeros((NLIMBS, factor * n), dtype=jnp.uint32)
    ext = ext.at[:, :n].set(coeffs)
    return coset_ntt(ext, shift, interpret=interpret)
