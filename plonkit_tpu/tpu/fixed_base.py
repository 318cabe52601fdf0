"""Batched fixed-base scalar multiplication on TPU: P_i = s_i * G for a
vector of scalars and one shared base point.

Used for device-side dev-SRS generation (crs_42: tau^i * G at 2^10..2^26 --
the host loop would take hours at 2^20; here it's seconds) and for
synthesizing benchmark bases.

Algorithm: windowed fixed-base method.  The 2^w multiples of G for each of
ceil(254/w) windows are precomputed on host (tiny: windows * 2^w points) and
uploaded as tables; each window contributes table[w][digit_i], selected per
lane with a gather, accumulated with batched Jacobian adds.  Cost:
ceil(254/w) mixed adds per point.
"""

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from ..fields import FQ_MODULUS, FR_MODULUS, fq_inv
from . import ec, mont
from .mont import FQ, NLIMBS

WINDOW = 8


@lru_cache(maxsize=None)
def _window_tables_host(base=None):
    """[num_windows][2^w] affine multiples: table[w][d] = d * 2^(8w) * G."""
    from ..curve import G1_GEN, g1_add, g1_double, g1_mul
    base_pt = base or G1_GEN
    num_windows = -(-256 // WINDOW)
    tables = []
    cur = base_pt
    for w in range(num_windows):
        row = [None]
        acc = None
        for d in range(1, 1 << WINDOW):
            acc = g1_add(acc, cur)
            row.append(acc)
        tables.append(row)
        # advance cur by 2^WINDOW doublings
        for _ in range(WINDOW):
            cur = g1_double(cur)
    return tables


@lru_cache(maxsize=None)
def _window_tables_device():
    tables = _window_tables_host()
    num_windows = len(tables)
    size = 1 << WINDOW
    xs = np.zeros((num_windows * size,), dtype=object)
    ys = np.zeros((num_windows * size,), dtype=object)
    infs = np.zeros((num_windows, size), dtype=bool)
    flat_x, flat_y = [], []
    for w, row in enumerate(tables):
        for d, p in enumerate(row):
            if p is None:
                infs[w][d] = True
                flat_x.append(0)
                flat_y.append(0)
            else:
                flat_x.append(p[0])
                flat_y.append(p[1])
    x = jnp.asarray(FQ.to_mont_np(flat_x)).reshape(NLIMBS, num_windows, size)
    y = jnp.asarray(FQ.to_mont_np(flat_y)).reshape(NLIMBS, num_windows, size)
    return x, y, jnp.asarray(infs)


def _digits_np(scalars):
    limbs = mont.FR.to_limbs_np(scalars).astype(np.uint32)  # [16, N] u16 limbs
    lo = limbs & 0xFF
    hi = limbs >> 8
    return np.stack([lo, hi], axis=1).reshape(32, -1).astype(np.int32)  # [32, N]


@lru_cache(maxsize=None)
def _accum_jit(n: int):
    def f(digits, tx, ty, tinf):
        num_windows = digits.shape[0]

        def body(w, acc):
            d = digits[w]
            px = jnp.take(tx[:, w, :], d, axis=1)
            py = jnp.take(ty[:, w, :], d, axis=1)
            pinf = jnp.take(tinf[w], d)
            return ec.add_mixed(acc, (px, py, pinf))

        return jax.lax.fori_loop(0, num_windows, body, ec.infinity(n))
    return jax.jit(f)


def batch_scalar_mul_base(scalars):
    """[s_i * G] as a Jacobian device batch (tuple of [16, N] arrays)."""
    n = len(scalars)
    digits = jnp.asarray(_digits_np([s % FR_MODULUS for s in scalars]))
    tx, ty, tinf = _window_tables_device()
    return _accum_jit(n)(digits, tx, ty, tinf)


@lru_cache(maxsize=None)
def _normalize_jit(n: int):
    from . import pallas_kernels as pk

    def f(X, Y, Z):
        zinv = pk.batch_inverse(FQ, Z)
        zinv2 = mont.mont_mul(FQ, zinv, zinv)
        zinv3 = mont.mont_mul(FQ, zinv2, zinv)
        return (mont.mont_mul(FQ, X, zinv2), mont.mont_mul(FQ, Y, zinv3),
                mont.is_zero(Z))
    return jax.jit(f)


def to_affine_batch(jac):
    """Jacobian batch -> (x, y, inf) affine Montgomery batch (on device)."""
    X, Y, Z = jac
    return _normalize_jit(X.shape[1])(X, Y, Z)


def affine_batch_to_host(aff):
    x, y, inf = aff
    xs = FQ.from_mont_np(np.asarray(x))
    ys = FQ.from_mont_np(np.asarray(y))
    infs = np.asarray(inf)
    return [None if i else (px, py) for px, py, i in zip(xs, ys, infs)]


CRS_CHUNK_LOG2 = 19   # 512k scalars/chunk: ~3.4 GiB of ladder temps on HBM


def gen_crs_g1_device(power: int, tau: int = 42):
    """Device-side crs_42: tau^i * G1 for i < 2^power, returned as host
    affine points (byte-identical to the reference's dev SRS).  Processed
    in fixed-size chunks: the 32-window ladder holds ~13 live [16, N]
    u32 temps, which at 2^22 in one shot exceeds a v5e's 16 GiB HBM."""
    n = 1 << power
    chunk = min(n, 1 << CRS_CHUNK_LOG2)
    # tau powers on host via square-mult chain (cheap python: n multiplications)
    pows = [1] * n
    for i in range(1, n):
        pows[i] = pows[i - 1] * tau % FR_MODULUS
    out = []
    for start in range(0, n, chunk):
        jac = batch_scalar_mul_base(pows[start:start + chunk])
        out.extend(affine_batch_to_host(to_affine_batch(jac)))
        del jac
    return out
