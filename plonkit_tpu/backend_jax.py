"""JAX/TPU compute backend: the production engine behind the PLONK prover.

Implements the same interface as backend.HostBackend but operates on
device-resident FrVec handles ([16, N] uint32 Montgomery limb arrays), so a
full proving round stays on the TPU; python ints only cross the boundary for
file IO and transcript scalars.

This replaces bellman's Worker thread pool (SURVEY §5.8) as the execution
backend; the multi-chip variant shards these same ops over a jax Mesh
(plonkit_tpu/parallel/).
"""

from functools import lru_cache, partial
from typing import List, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np

from .fields import FR_MODULUS as R, FR_GENERATOR, fr_inv
from .tpu import ec, mont, msm as tpu_msm, ntt as tpu_ntt, ntt_mxu as tpu_ntt_mxu, pallas_kernels as pk
from .tpu.mont import FR, NLIMBS

import os

# NTT engine selection: the MXU matmul NTT (tpu/ntt_mxu.py) is ~5x the Pease
# butterfly pipeline on real TPU hardware (17.9 vs 97.2 ms at 2^20, slope-
# timed); the Pease path remains for the CPU test backend (int8 matmuls are
# emulated there) and as a differential-testing oracle.
_NTT_ENGINE = os.environ.get("PLONKIT_TPU_NTT", "auto")


def _use_mxu_ntt(n: int, interpret: bool) -> bool:
    if _NTT_ENGINE == "mxu":
        return True
    if _NTT_ENGINE == "pease":
        return False
    return (not interpret and n >= 512
            and jax.default_backend() != "cpu")


class FrVec:
    """Device-resident vector of Fr elements (Montgomery form)."""

    __slots__ = ("data",)

    def __init__(self, data):
        self.data = data

    def __len__(self):
        return self.data.shape[1]


def _as_dev(v) -> jnp.ndarray:
    return v.data if isinstance(v, FrVec) else v


PULL_CHUNK_COLS = 1 << 19   # 32 MiB per device->host pull: larger single
#                             transfers intermittently wedge the axon tunnel


def pull_np(arr) -> np.ndarray:
    """Chunked device->host transfer for [16, N] limb arrays."""
    n = arr.shape[1]
    if n <= PULL_CHUNK_COLS:
        return np.asarray(arr)
    parts = [np.asarray(arr[:, i:i + PULL_CHUNK_COLS])
             for i in range(0, n, PULL_CHUNK_COLS)]
    return np.concatenate(parts, axis=1)


def push_dev(arr) -> jnp.ndarray:
    """Chunked host->device transfer for [16, N] limb arrays."""
    n = arr.shape[1]
    if n <= PULL_CHUNK_COLS:
        return jnp.asarray(arr)
    parts = [jnp.asarray(np.ascontiguousarray(arr[:, i:i + PULL_CHUNK_COLS]))
             for i in range(0, n, PULL_CHUNK_COLS)]
    return jnp.concatenate(parts, axis=1)


@lru_cache(maxsize=None)
def _const_mont(value: int):
    # host np array (NOT jnp): a cached jnp array created inside a trace
    # would leak tracers across jit boundaries
    return FR.to_mont_np([value % R])


# jitted helpers -------------------------------------------------------------

@lru_cache(maxsize=None)
def _to_mont_jit():
    def f(raw):
        return mont.to_mont(FR, raw)
    return jax.jit(f)


@lru_cache(maxsize=None)
def _from_mont_jit():
    def f(data):
        return mont.from_mont(FR, data)
    return jax.jit(f)


@lru_cache(maxsize=None)
def _inverse_jit():
    # eager mont_pow re-traces its ~700-op CIOS fori body on every call
    # (~2 s of python tracing per batch_inverse at any size)
    def f(data):
        return mont.inverse(FR, data)
    return jax.jit(f)


@lru_cache(maxsize=None)
def _scale_add_jit(interpret: bool):
    # (a * k + c) elementwise with broadcast scalar k
    def f(a, k, c):
        t = pk.mul(FR, a, jnp.broadcast_to(k, a.shape), interpret=interpret)
        return pk.add(FR, t, c, interpret=interpret)
    return jax.jit(f)


@lru_cache(maxsize=None)
def _prefix_products_jit(n: int, interpret: bool):
    """Inclusive prefix products via Hillis-Steele rounds inside a fori_loop:
    one compiled mul per round regardless of n (associative_scan would emit
    log(n) distinct-shape kernels)."""
    rounds = max(1, (n - 1).bit_length())

    def f(x):
        def body(i, p):
            d = jnp.int32(1) << i
            cols = jax.lax.broadcasted_iota(jnp.int32, (n,), 0)
            mask = cols >= d
            rolled = jnp.roll(p, d, axis=1)
            ones = jnp.broadcast_to(jnp.asarray(_const_mont(1)), p.shape)
            rolled = jnp.where(mask[None], rolled, ones)
            return pk.mul(FR, p, rolled, interpret=interpret)
        return jax.lax.fori_loop(0, rounds, body, x)
    return jax.jit(f)


def _shift_in_one(factors):
    one = jnp.asarray(_const_mont(1))
    return jnp.concatenate(
        [jnp.broadcast_to(one, (NLIMBS, 1)), factors[:, :-1]], axis=1)


@lru_cache(maxsize=None)
def _suffix_sums_jit(n: int, interpret: bool):
    """S_k = sum_{j>=k} v_j via Hillis-Steele rounds (Fr add)."""
    rounds = max(1, (n - 1).bit_length())

    def f(v):
        def body(i, p):
            d = jnp.int32(1) << i
            cols = jax.lax.broadcasted_iota(jnp.int32, (n,), 0)
            mask = cols < (n - d)
            shifted = jnp.where(mask[None], jnp.roll(p, -d, axis=1), 0)
            return pk.add(FR, p, shifted, interpret=interpret)
        return jax.lax.fori_loop(0, rounds, body, v)
    return jax.jit(f)


def _pow_vec(x_limb, n: int, interpret: bool):
    """powers [1, x, x^2, ..., x^(n-1)] from a [16,1] Montgomery scalar."""
    xs = jnp.broadcast_to(jnp.asarray(x_limb), (NLIMBS, n))
    return _prefix_products_jit(n, interpret)(_shift_in_one(xs))


@lru_cache(maxsize=None)
def _inner_eval_jit(n: int, interpret: bool):
    """sum_i c_i * p_i (elementwise mul then log-tree reduction)."""
    def f(c, p):
        prod = pk.mul(FR, c, p, interpret=interpret)
        m = n
        while m > 1:
            half = m // 2
            if m % 2:
                tail = prod[:, m - 1:m]
                prod = pk.add(FR, prod[:, :half], prod[:, half:m - 1 + 1][:, :half], interpret=interpret)
                prod = jnp.concatenate([prod, tail], axis=1)
                m = half + 1
            else:
                prod = pk.add(FR, prod[:, :half], prod[:, half:], interpret=interpret)
                m = half
        return prod
    return jax.jit(f)


class JaxBackend:
    name = "jax"

    def __init__(self, interpret: bool = False):
        self.interpret = interpret
        self._msm_cache = {}

    # -- conversions -------------------------------------------------------

    def from_ints(self, values: Sequence[int], pad_to: int = None) -> FrVec:
        vals = list(values)
        if pad_to is not None and len(vals) < pad_to:
            vals = vals + [0] * (pad_to - len(vals))
        # raw limb split on host (cheap bytes-based numpy), then ONE jitted
        # Montgomery conversion: the eager to_mont executed its ~700-op
        # CIOS graph op-by-op (~20 s of dispatch per 2^20 vector through
        # the remote-TPU tunnel).  u32 limbs on the wire: the axon
        # device_put path moves u32 at ~70 MB/s but hits a ~20x slower
        # fallback for u16 arrays, so the half-width format loses.
        raw = push_dev(FR.to_limbs_np(vals))
        return FrVec(_to_mont_jit()(raw))

    def to_ints(self, v: FrVec) -> List[int]:
        # jitted from-Montgomery (the eager CIOS graph costs ~75 s of
        # per-op dispatch at 2^20 through the remote tunnel)
        raw = pull_np(_from_mont_jit()(v.data))
        return FR.from_limbs_np(raw)

    # -- NTT ---------------------------------------------------------------

    def ntt(self, v: FrVec) -> FrVec:
        if _use_mxu_ntt(len(v), self.interpret):
            return FrVec(tpu_ntt_mxu.ntt_mxu(v.data, interpret=self.interpret))
        return FrVec(tpu_ntt.ntt(v.data, interpret=self.interpret))

    def intt(self, v: FrVec) -> FrVec:
        if _use_mxu_ntt(len(v), self.interpret):
            return FrVec(tpu_ntt_mxu.intt_mxu(v.data, interpret=self.interpret))
        return FrVec(tpu_ntt.intt(v.data, interpret=self.interpret))

    def coset_ntt(self, v: FrVec, shift: int = FR_GENERATOR) -> FrVec:
        if _use_mxu_ntt(len(v), self.interpret):
            return FrVec(tpu_ntt_mxu.coset_ntt_mxu(v.data, shift, interpret=self.interpret))
        return FrVec(tpu_ntt.coset_ntt(v.data, shift, interpret=self.interpret))

    def coset_intt(self, v: FrVec, shift: int = FR_GENERATOR) -> FrVec:
        if _use_mxu_ntt(len(v), self.interpret):
            return FrVec(tpu_ntt_mxu.coset_intt_mxu(v.data, shift, interpret=self.interpret))
        return FrVec(tpu_ntt.coset_intt(v.data, shift, interpret=self.interpret))

    def coset_lde(self, v: FrVec, factor: int, shift: int = FR_GENERATOR) -> FrVec:
        if _use_mxu_ntt(len(v) * factor, self.interpret):
            return FrVec(tpu_ntt_mxu.coset_lde_mxu(v.data, factor, shift, interpret=self.interpret))
        return FrVec(tpu_ntt.coset_lde(v.data, factor, shift, interpret=self.interpret))

    # -- MSM ---------------------------------------------------------------

    def msm_context(self, bases, key=None):
        if key is not None and key in self._msm_cache:
            ctx = self._msm_cache[key]
            if ctx.n >= len(bases):
                return ctx
        n = len(bases)
        if n <= 4096 or jax.default_backend() == "cpu":
            # tiny MSMs (and the CPU test backend, where the window kernel's
            # EC fori bodies take minutes of XLA compile) run on host
            from .backend import _HostMSMContext
            ctx = _HostMSMContext(bases)
        else:
            ctx = tpu_msm.MSMContext(bases)
        if key is not None:
            self._msm_cache[key] = ctx
        return ctx

    def msm_context_from_crs(self, crs, size: int, key=None):
        """SRS-backed MSM context using the bulk numpy loader + on-device
        Montgomery conversion (no per-point python ints)."""
        if key is not None and key in self._msm_cache:
            ctx = self._msm_cache[key]
            if ctx.n >= size:
                return ctx
        if size <= 4096 or jax.default_backend() == "cpu":
            from .backend import _HostMSMContext
            ctx = _HostMSMContext(crs.g1_bases[:size])
        else:
            from .serialization import CrsHandle
            if isinstance(crs, CrsHandle):
                x_raw, y_raw, inf = crs.g1_limbs(size)
            else:
                from .tpu import ec as _ec
                x_mont, y_mont, inf_d = _ec.affine_from_host(crs.g1_bases[:size])
                ctx = tpu_msm.MSMContext.from_device_affine(x_mont, y_mont, inf_d)
                if key is not None:
                    self._msm_cache[key] = ctx
                return ctx
            to_mont = jax.jit(lambda r: mont.to_mont(mont.FQ, r))
            x_mont = to_mont(push_dev(x_raw))
            y_mont = to_mont(push_dev(y_raw))
            ctx = tpu_msm.MSMContext.from_device_affine(
                x_mont, y_mont, jnp.asarray(inf), c=13,
                host_points_loader=lambda h=crs: h.g1_bases)
        if key is not None:
            self._msm_cache[key] = ctx
        return ctx

    def msm(self, bases, scalars: Union[FrVec, Sequence[int]]):
        if isinstance(scalars, FrVec):
            scalars = self.to_ints(scalars)
        ctx = self.msm_context(bases, key=id(bases))
        return ctx.msm(list(scalars))

    # -- elementwise -------------------------------------------------------

    def mul(self, a: FrVec, b: FrVec) -> FrVec:
        return FrVec(pk.mul(FR, a.data, b.data, interpret=self.interpret))

    def add(self, a: FrVec, b: FrVec) -> FrVec:
        return FrVec(pk.add(FR, a.data, b.data, interpret=self.interpret))

    def sub(self, a: FrVec, b: FrVec) -> FrVec:
        return FrVec(pk.sub(FR, a.data, b.data, interpret=self.interpret))

    def scale(self, a: FrVec, k: int) -> FrVec:
        kv = _const_mont(k % R)
        return FrVec(pk.mul(FR, a.data, jnp.broadcast_to(kv, a.data.shape),
                            interpret=self.interpret))

    def add_scalar(self, a: FrVec, k: int) -> FrVec:
        kv = jnp.broadcast_to(_const_mont(k % R), a.data.shape)
        return FrVec(pk.add(FR, a.data, kv, interpret=self.interpret))

    def scale_add(self, a: FrVec, k: int, c: FrVec) -> FrVec:
        """a * k + c in one fused dispatch."""
        return FrVec(_scale_add_jit(self.interpret)(a.data, _const_mont(k % R), c.data))

    # -- scans / reductions ------------------------------------------------

    def grand_product(self, factors: FrVec) -> FrVec:
        n = len(factors)
        return FrVec(_prefix_products_jit(n, self.interpret)(_shift_in_one(factors.data)))

    def batch_inverse(self, v: FrVec) -> FrVec:
        return FrVec(_inverse_jit()(v.data))

    def powers(self, base: int, n: int) -> FrVec:
        return FrVec(_pow_vec(_const_mont(base % R), n, self.interpret))

    def poly_eval(self, coeffs: FrVec, x: int) -> int:
        n = len(coeffs)
        pows = _pow_vec(_const_mont(x % R), n, self.interpret)
        res = _inner_eval_jit(n, self.interpret)(coeffs.data, pows)
        return FR.from_mont_np(np.asarray(res))[0]

    def divide_by_linear(self, coeffs: FrVec, point: int) -> FrVec:
        """Quotient of p(X) / (X - point), remainder dropped.
        q_k = z^-(k+1) * S_{k+1} where S_k = suffix sum of c_j z^j."""
        n = len(coeffs)
        z_pows = _pow_vec(_const_mont(point % R), n, self.interpret)
        cz = pk.mul(FR, coeffs.data, z_pows, interpret=self.interpret)
        suffix = _suffix_sums_jit(n, self.interpret)(cz)
        # shift left by one: S_{k+1}
        s_next = jnp.concatenate([suffix[:, 1:], jnp.zeros((NLIMBS, 1), dtype=jnp.uint32)], axis=1)
        zinv = fr_inv(point % R)
        zi_pows = _pow_vec(_const_mont(zinv), n, self.interpret)
        zi_shift = pk.mul(FR, zi_pows,
                          jnp.broadcast_to(jnp.asarray(_const_mont(zinv)), (NLIMBS, n)),
                          interpret=self.interpret)  # z^-(k+1)
        q = pk.mul(FR, s_next, zi_shift, interpret=self.interpret)
        return FrVec(q[:, :n - 1])

    def commit(self, msm_ctx, v: FrVec):
        """KZG-commit without leaving the device: MSM digit decomposition
        runs on device when the context supports it."""
        if hasattr(msm_ctx, "msm_vec"):
            return msm_ctx.msm_vec(v.data)
        return msm_ctx.msm(self.to_ints(v))

    # -- memory placement ----------------------------------------------------
    # Large provers (the 2^22 aggregation circuit on a 16 GB v5e) keep
    # monomial-form polynomials host-resident and stream them through HBM.

    def offload(self, v: FrVec) -> np.ndarray:
        return pull_np(v.data)

    def onload(self, h) -> FrVec:
        if isinstance(h, FrVec):
            return h
        return FrVec(push_dev(h))

    # -- structural --------------------------------------------------------

    def slice(self, v: FrVec, start: int, stop: int) -> FrVec:
        return FrVec(v.data[:, start:stop])

    def concat(self, vs: Sequence[FrVec]) -> FrVec:
        return FrVec(jnp.concatenate([v.data for v in vs], axis=1))

    def rotate(self, v: FrVec, k: int) -> FrVec:
        return FrVec(jnp.roll(v.data, -k, axis=1))

    def tile_small(self, values: Sequence[int], total: int) -> FrVec:
        base = jnp.asarray(FR.to_mont_np(list(values)))
        reps = total // base.shape[1]
        return FrVec(jnp.tile(base, (1, reps))[:, :total])

    def zeros(self, n: int) -> FrVec:
        return FrVec(jnp.zeros((NLIMBS, n), dtype=jnp.uint32))
