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

# Coset transforms at or above this many elements run as `factor` split
# n-point transforms instead of one factor*n-point transform, bounding the
# transform workspace next to the prover's live GiB-scale accumulators
# (JaxBackend._coset_lde_split).  2^24 = the 2^22 aggregation domain's LDE.
_SPLIT_NTT_MIN = int(os.environ.get("PLONKIT_TPU_SPLIT_NTT_MIN", str(1 << 24)))


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
def _fma_acc_jit(interpret: bool):
    # acc + x*y with the accumulator buffer DONATED: XLA reuses the
    # allocation instead of churning GiB-sized buffers (the 2^22 extended
    # prover's quotient accumulation fragmented HBM to death without it)
    def f(acc, x, y):
        return pk.add(FR, acc, pk.mul(FR, x, y, interpret=interpret),
                      interpret=interpret)
    return jax.jit(f, donate_argnums=(0,))


@lru_cache(maxsize=None)
def _add_into_jit(interpret: bool):
    def f(acc, t):
        return pk.add(FR, acc, t, interpret=interpret)
    return jax.jit(f, donate_argnums=(0,))


@lru_cache(maxsize=None)
def _mul_into_jit(interpret: bool):
    def f(acc, t):
        return pk.mul(FR, acc, t, interpret=interpret)
    return jax.jit(f, donate_argnums=(0,))


@lru_cache(maxsize=None)
def _scale_add_jit(interpret: bool):
    # (a * k + c) elementwise with broadcast scalar k
    def f(a, k, c):
        t = pk.mul(FR, a, jnp.broadcast_to(k, a.shape), interpret=interpret)
        return pk.add(FR, t, c, interpret=interpret)
    return jax.jit(f)


def _prefix_products_body(x, n: int, interpret: bool):
    """Inclusive prefix products via Hillis-Steele rounds inside a fori_loop:
    one compiled mul per round regardless of n (associative_scan would emit
    log(n) distinct-shape kernels)."""
    rounds = max(1, (n - 1).bit_length())

    def body(i, p):
        d = jnp.int32(1) << i
        cols = jax.lax.broadcasted_iota(jnp.int32, (n,), 0)
        mask = cols >= d
        rolled = jnp.roll(p, d, axis=1)
        ones = jnp.broadcast_to(jnp.asarray(_const_mont(1)), p.shape)
        rolled = jnp.where(mask[None], rolled, ones)
        return pk.mul(FR, p, rolled, interpret=interpret)
    return jax.lax.fori_loop(0, rounds, body, x)


@lru_cache(maxsize=None)
def _prefix_products_jit(n: int, interpret: bool):
    return jax.jit(partial(_prefix_products_body, n=n, interpret=interpret))


def _suffix_products_body(x, n: int, interpret: bool):
    """Inclusive suffix products S_i = prod_{j>=i} x_j (Hillis-Steele)."""
    rounds = max(1, (n - 1).bit_length())

    def body(i, p):
        d = jnp.int32(1) << i
        cols = jax.lax.broadcasted_iota(jnp.int32, (n,), 0)
        mask = cols < (n - d)
        rolled = jnp.roll(p, -d, axis=1)
        ones = jnp.broadcast_to(jnp.asarray(_const_mont(1)), p.shape)
        rolled = jnp.where(mask[None], rolled, ones)
        return pk.mul(FR, p, rolled, interpret=interpret)
    return jax.lax.fori_loop(0, rounds, body, x)


def _batch_inverse_body(v, n: int, interpret: bool):
    """Montgomery batch inversion (zeros map to zero): two product scans,
    ONE tiny scalar Fermat, and two combining muls — the elementwise
    Fermat ladder (254 unfused CIOS rounds over the whole vector) measured
    12.4 s at 2^20; this is ~44 full-width muls (~0.1 s)."""
    one = jnp.broadcast_to(jnp.asarray(_const_mont(1)), v.shape)
    zero_mask = jnp.all(v == 0, axis=0)
    x = jnp.where(zero_mask[None], one, v)
    pre = _prefix_products_body(x, n, interpret)          # P_i = prod_{j<=i}
    suf = _suffix_products_body(x, n, interpret)          # S_i = prod_{j>=i}
    total_inv = mont.inverse(FR, pre[:, n - 1:n])         # [16, 1] Fermat
    # inv(x_i) = P_{i-1} * S_{i+1} * T^-1
    pre_excl = jnp.concatenate([one[:, :1], pre[:, :n - 1]], axis=1)
    suf_excl = jnp.concatenate([suf[:, 1:], one[:, :1]], axis=1)
    out = pk.mul(FR, pre_excl, suf_excl, interpret=interpret)
    out = pk.mul(FR, out, jnp.broadcast_to(total_inv, v.shape),
                 interpret=interpret)
    return jnp.where(zero_mask[None], 0, out)


@lru_cache(maxsize=None)
def _batch_inverse_jit(n: int, interpret: bool):
    return jax.jit(partial(_batch_inverse_body, n=n, interpret=interpret))


@lru_cache(maxsize=None)
def _gate_residual_jit(interpret: bool):
    def f(sel_v, wires_v, pi):
        def mul(a, b2):
            return pk.mul(FR, a, b2, interpret=interpret)

        def add(a, b2):
            return pk.add(FR, a, b2, interpret=interpret)
        q, w = sel_v, wires_v
        acc = add(mul(q[0], w[0]), mul(q[1], w[1]))
        acc = add(acc, mul(q[2], w[2]))
        acc = add(acc, mul(q[3], w[3]))
        acc = add(acc, mul(q[4], mul(w[0], w[1])))
        acc = add(acc, q[5])
        acc = add(acc, mul(q[6], jnp.roll(w[3], -1, axis=1)))
        return add(acc, pi)
    return jax.jit(f)


@lru_cache(maxsize=None)
def _any_nonzero_jit():
    def f(data):
        return jnp.any(data != 0)
    return jax.jit(f)


@lru_cache(maxsize=None)
def _quotient_column_jit(n: int, w: int, interpret: bool):
    """Round 3's coset elementwise pipeline (gate identity + permutation
    + L0 boundary, times Z_H^-1) in ONE program — ~40 eager dispatches
    otherwise (see _perm_grand_product_jit)."""
    def f(sel_l, wires_l, d_next_l, z_l, z_next_l, pi_l, x_coset, sigma_l,
          l0_l, vanishing_inv, kbetas, beta_v, gamma_v, alpha_v, alpha2_v):
        def bc(c):
            return jnp.broadcast_to(c, z_l.shape)

        def mul(a, b2):
            return pk.mul(FR, a, b2, interpret=interpret)

        def add(a, b2):
            return pk.add(FR, a, b2, interpret=interpret)

        gate = mul(sel_l[0], wires_l[0])
        gate = add(gate, mul(sel_l[1], wires_l[1]))
        gate = add(gate, mul(sel_l[2], wires_l[2]))
        gate = add(gate, mul(sel_l[3], wires_l[3]))
        gate = add(gate, mul(sel_l[4], mul(wires_l[0], wires_l[1])))
        gate = add(gate, sel_l[5])
        gate = add(gate, mul(sel_l[6], d_next_l))
        gate = add(gate, pi_l)

        perm_num = z_l
        perm_den = z_next_l
        for j in range(w):
            t_n = add(add(mul(x_coset, bc(kbetas[j])), wires_l[j]),
                      bc(gamma_v))
            t_d = add(add(mul(sigma_l[j], bc(beta_v)), wires_l[j]),
                      bc(gamma_v))
            perm_num = mul(perm_num, t_n)
            perm_den = mul(perm_den, t_d)
        perm = pk.sub(FR, perm_num, perm_den, interpret=interpret)

        numerator = add(gate, mul(perm, bc(alpha_v)))
        m1 = jnp.asarray(_const_mont(R - 1))
        z_minus_1_l0 = mul(add(z_l, bc(m1)), l0_l)
        numerator = add(numerator, mul(z_minus_1_l0, bc(alpha2_v)))
        return mul(numerator, vanishing_inv)
    return jax.jit(f)


@lru_cache(maxsize=None)
def _perm_grand_product_jit(n: int, w: int, interpret: bool):
    """Round 2's whole numerator/denominator/grand-product pipeline as ONE
    program: ~30 eager dispatches of this chain cost ~12.5 s of wall at
    2^20 through the remote-TPU path (each eager op's true cost only
    surfaces at the next real synchronization), vs <1 s fused."""
    def f(omega_pows, sigmas, wires, kbetas, beta_v, gamma_v):
        def bc(c):
            return jnp.broadcast_to(c, omega_pows.shape)
        num = None
        den = None
        for j in range(w):
            t_n = pk.add(FR, pk.mul(FR, omega_pows, bc(kbetas[j]),
                                    interpret=interpret),
                         wires[j], interpret=interpret)
            t_n = pk.add(FR, t_n, bc(gamma_v), interpret=interpret)
            t_d = pk.add(FR, pk.mul(FR, sigmas[j], bc(beta_v),
                                    interpret=interpret),
                         wires[j], interpret=interpret)
            t_d = pk.add(FR, t_d, bc(gamma_v), interpret=interpret)
            num = t_n if num is None else pk.mul(FR, num, t_n,
                                                 interpret=interpret)
            den = t_d if den is None else pk.mul(FR, den, t_d,
                                                 interpret=interpret)
        ratio = pk.mul(FR, num, _batch_inverse_body(den, n, interpret),
                       interpret=interpret)
        return _prefix_products_body(_shift_in_one(ratio), n, interpret)
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


def _limb_sum_split(prod, n: int):
    """Carry-deferred limb sum over the last axis: [..., 16-limb, n] u32
    (each limb < 2^16) -> ([..., 16] lo u32, [..., 16] hi u32).  Fr
    addition is linear, so the sum of reduced Montgomery products can be
    taken limb-wise as plain integers and reduced mod p ONCE on host — no
    log(n)-round modular adder tree (whose per-round shapes each cost a
    pallas compile).  All-u32 staging (TPU JAX has no x64): inner chunks
    of <= 2^13 terms (2^13 * 2^16 < 2^29), then the partials split into
    16-bit halves summed separately (m <= 2^13 partials: lo < 2^29,
    hi < 2^13 each, both safely in u32)."""
    inner = 1
    while inner * inner < n and inner < (1 << 13):
        inner *= 2
    if n % inner:
        pad = inner - n % inner
        prod = jnp.pad(prod, [(0, 0)] * (prod.ndim - 1) + [(0, pad)])
    m = prod.shape[-1] // inner
    assert m <= (1 << 16), (n, inner, m)
    shape = prod.shape[:-1] + (m, inner)
    partial = jnp.sum(prod.reshape(shape), axis=-1, dtype=jnp.uint32)
    lo = jnp.sum(partial & jnp.uint32(0xFFFF), axis=-1, dtype=jnp.uint32)
    hi = jnp.sum(partial >> 16, axis=-1, dtype=jnp.uint32)
    return lo, hi


def _limb_sums_to_ints(lo, hi) -> List[int]:
    """([16, k] lo, [16, k] hi) u32 limb sums -> canonical ints (one mod +
    from-Montgomery per value, on host)."""
    inv_r = pow(1 << 256, -1, R)
    lo_np, hi_np = np.asarray(lo), np.asarray(hi)
    out = []
    for j in range(lo_np.shape[1]):
        v = sum((int(lo_np[i, j]) + (int(hi_np[i, j]) << 16)) << (16 * i)
                for i in range(lo_np.shape[0]))
        out.append(v % R * inv_r % R)
    return out


@lru_cache(maxsize=None)
def _eval_many_jit(n: int, k: int, interpret: bool):
    """Evaluate k length-n polynomials at one point in ONE fused program:
    a single powers scan (20 mul rounds at 2^20 — the expensive part) is
    shared by every polynomial; the inner products are carry-deferred limb
    sums (see _limb_sum_u64) finished on host.  One [16, k] u64 pull
    returns all results.  The round-4 prover issued ~10 serial poly_eval
    calls, each recomputing the powers vector and syncing the device."""
    def f(stack, x_limb):  # stack [16, k, n]; x_limb [16, 1] Montgomery
        xs = jnp.broadcast_to(x_limb, (NLIMBS, n))
        pows = _prefix_products_body(_shift_in_one(xs), n, interpret)
        pw = jnp.broadcast_to(pows[:, None, :], (NLIMBS, k, n))
        prod = pk.mul(FR, stack.reshape(NLIMBS, k * n),
                      pw.reshape(NLIMBS, k * n), interpret=interpret)
        return _limb_sum_split(prod.reshape(NLIMBS, k, n), n)
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

    def from_raw_limbs(self, raw) -> FrVec:
        """[16, N] uint32 raw (canonical) limb array -> device Montgomery
        vector.  The witness fast path: the WitnessPlan emits raw limbs
        directly (one conversion per distinct value), skipping the
        python-int column round trip."""
        return FrVec(_to_mont_jit()(push_dev(raw)))

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
        if len(v) >= _SPLIT_NTT_MIN and len(v) % 4 == 0:
            return self._coset_intt_split(v, 4, shift)
        if _use_mxu_ntt(len(v), self.interpret):
            return FrVec(tpu_ntt_mxu.coset_intt_mxu(v.data, shift, interpret=self.interpret))
        return FrVec(tpu_ntt.coset_intt(v.data, shift, interpret=self.interpret))

    def coset_lde(self, v: FrVec, factor: int, shift: int = FR_GENERATOR) -> FrVec:
        if len(v) * factor >= _SPLIT_NTT_MIN:
            return self._coset_lde_split(v, factor, shift)
        if _use_mxu_ntt(len(v) * factor, self.interpret):
            return FrVec(tpu_ntt_mxu.coset_lde_mxu(v.data, factor, shift, interpret=self.interpret))
        return FrVec(tpu_ntt.coset_lde(v.data, factor, shift, interpret=self.interpret))

    # -- split (workspace-bounded) large coset transforms --------------------
    # A factor*n coset LDE is `factor` independent n-point coset NTTs:
    # LDE[F*t + j] = p(g*eta^(F*t+j)) = coset_ntt_n(p, g*eta^j)[t]
    # (eta = omega_{F*n}, eta^F = omega_n).  At the 2^22 aggregation domain
    # a single 2^24-point transform's stage workspaces alone exhaust a
    # 16 GiB v5e next to the live quotient accumulators (the round-5 OOM in
    # prove2's r3); the split bounds transform workspace at the n-point
    # size the rest of the prover already runs, at the cost of F serial
    # dispatches with queue drains.  The inverse recombines the strided
    # parts with a 4-point DFT across j:  coset_intt_n(v[j::F], g*eta^j)
    # gives c_j[k] = sum_m p[k+m*n] * (g^n)^m * u^(j*m)  (u = eta^n, a
    # primitive F-th root), so  p[k+m*n] = g^(-n*m)/F * sum_j u^(-j*m) c_j[k].

    def _coset_lde_split(self, v: FrVec, factor: int, shift: int) -> FrVec:
        from .fields import get_domain_omega
        from .profiling import sync_device
        n = len(v)
        eta = get_domain_omega(factor * n)
        parts = []
        for j in range(factor):
            sj = shift * pow(eta, j, R) % R
            parts.append(self.coset_ntt(v, sj).data)
            sync_device()
        # [16, n, F] -> [16, F*n] interleaves part j at positions F*t + j
        out = jnp.stack(parts, axis=-1).reshape(NLIMBS, factor * n)
        del parts
        sync_device()
        return FrVec(out)

    def _coset_intt_split(self, v: FrVec, factor: int, shift: int) -> FrVec:
        from .fields import get_domain_omega
        from .profiling import sync_device
        total = len(v)
        n = total // factor
        eta = get_domain_omega(total)
        u = pow(eta, n, R)
        u_inv = fr_inv(u)
        g_n_inv = fr_inv(pow(shift, n, R))
        f_inv = fr_inv(factor)
        cs = []
        for j in range(factor):
            sj = shift * pow(eta, j, R) % R
            part = FrVec(v.data[:, j::factor])
            cs.append(self.coset_intt(part, sj))
            sync_device()
        chunks = []
        for m in range(factor):
            gm = pow(g_n_inv, m, R) * f_inv % R
            acc = self.scale(cs[0], gm)
            for j in range(1, factor):
                acc = self.scale_add(cs[j], gm * pow(u_inv, j * m, R) % R, acc)
            chunks.append(acc.data)
            sync_device()
        out = jnp.concatenate(chunks, axis=1)
        del chunks
        sync_device()
        return FrVec(out)

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
            # same c=12 layout as the device-affine path: the window
            # programs are shared (one compiled MSM shape set per size)
            # and c=12 measured faster than c=13 on the round-5 engine
            ctx = tpu_msm.MSMContext.from_device_affine(
                x_mont, y_mont, jnp.asarray(inf),
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

    # -- donated accumulators (buffer-reusing; the input acc is CONSUMED) --

    def fma_acc(self, acc: FrVec, x: FrVec, y: FrVec) -> FrVec:
        """acc + x*y, donating acc's buffer.  acc must not be used again."""
        return FrVec(_fma_acc_jit(self.interpret)(acc.data, x.data, y.data))

    def add_into(self, acc: FrVec, t: FrVec) -> FrVec:
        """acc + t, donating acc's buffer."""
        return FrVec(_add_into_jit(self.interpret)(acc.data, t.data))

    def mul_into(self, acc: FrVec, t: FrVec) -> FrVec:
        """acc * t, donating acc's buffer."""
        return FrVec(_mul_into_jit(self.interpret)(acc.data, t.data))

    # -- scans / reductions ------------------------------------------------

    def grand_product(self, factors: FrVec) -> FrVec:
        n = len(factors)
        return FrVec(_prefix_products_jit(n, self.interpret)(_shift_in_one(factors.data)))

    def gate_residual(self, sel_v, wires_v, pi_vec) -> FrVec:
        fn = _gate_residual_jit(self.interpret)
        return FrVec(fn(tuple(q.data for q in sel_v),
                        tuple(w.data for w in wires_v), pi_vec.data))

    def any_nonzero(self, v: FrVec) -> bool:
        # one scalar crosses the wire instead of the 64 MB limb pull
        return bool(jax.device_get(_any_nonzero_jit()(v.data)))

    def quotient_column(self, sel_l, wires_l, d_next_l, z_l, z_next_l,
                        pi_l, x_coset, sigma_l, l0_l, vanishing_inv,
                        beta: int, gamma: int, alpha: int, k_cols):
        n = len(z_l)
        fn = _quotient_column_jit(n, len(k_cols), self.interpret)
        kbetas = tuple(jnp.asarray(_const_mont(k * beta % R))
                       for k in k_cols)
        alpha2 = alpha * alpha % R
        return FrVec(fn(
            tuple(v.data for v in sel_l), tuple(v.data for v in wires_l),
            d_next_l.data, z_l.data, z_next_l.data, pi_l.data, x_coset.data,
            tuple(v.data for v in sigma_l), l0_l.data, vanishing_inv.data,
            kbetas, jnp.asarray(_const_mont(beta % R)),
            jnp.asarray(_const_mont(gamma % R)),
            jnp.asarray(_const_mont(alpha % R)),
            jnp.asarray(_const_mont(alpha2))))

    def permutation_grand_product(self, omega_pows, sigma_v, wires_v,
                                  beta: int, gamma: int, k_cols) -> FrVec:
        """z column for the permutation argument, fused end to end (see
        backend.HostBackend.permutation_grand_product for the spec)."""
        n = len(wires_v[0])
        kbetas = tuple(jnp.asarray(_const_mont(k * beta % R))
                       for k in k_cols)
        fn = _perm_grand_product_jit(n, len(wires_v), self.interpret)
        return FrVec(fn(omega_pows.data,
                        tuple(s.data for s in sigma_v),
                        tuple(w.data for w in wires_v),
                        kbetas,
                        jnp.asarray(_const_mont(beta % R)),
                        jnp.asarray(_const_mont(gamma % R))))

    def batch_inverse(self, v: FrVec) -> FrVec:
        return FrVec(_batch_inverse_jit(len(v), self.interpret)(v.data))

    def powers(self, base: int, n: int) -> FrVec:
        return FrVec(_pow_vec(_const_mont(base % R), n, self.interpret))

    def perm_from_labels(self, label_idx) -> List[FrVec]:
        """Sigma value vectors from the [4, size] label-index array (label
        c*size + r == K_COLS[c] * omega^r): one device pow-scan, 4 scalar
        muls and 4 gathers — replaces ~5 s/vector of host bigint limb
        conversion at 2^20 (plonk.setup.SetupPolynomials docstring)."""
        from .plonk.setup import K_COLS
        size = int(label_idx.shape[1])
        from .fields import get_domain_omega
        pows = self.powers(get_domain_omega(size), size)
        table = jnp.concatenate(
            [self.scale(pows, k).data for k in K_COLS], axis=1)
        return [FrVec(jnp.take(table, jnp.asarray(idx, dtype=jnp.int32),
                               axis=1))
                for idx in label_idx]

    def poly_eval(self, coeffs: FrVec, x: int) -> int:
        return self.poly_eval_many([coeffs], x)[0]

    def poly_eval_many(self, polys: Sequence[FrVec], x: int) -> List[int]:
        """All polynomials (same length) evaluated at one point: one fused
        program, one device round-trip."""
        n = len(polys[0])
        assert all(len(p) == n for p in polys), "poly_eval_many: equal lengths"
        stack = jnp.stack([p.data for p in polys], axis=1)
        lo, hi = _eval_many_jit(n, len(polys), self.interpret)(
            stack, jnp.asarray(_const_mont(x % R)))
        return _limb_sums_to_ints(lo, hi)

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

    def commit_many(self, msm_ctx, vs: Sequence[FrVec]):
        """Batch commit: queue every MSM's fused program before resolving
        any flag check, so the device pipeline never drains between the
        prover's back-to-back commitments (4 wire commits, 4 quotient
        chunk commits, 2 openings)."""
        if hasattr(msm_ctx, "msm_vec_begin"):
            handles = [msm_ctx.msm_vec_begin(v.data) for v in vs]
            return [msm_ctx.msm_vec_end(h) for h in handles]
        return [self.commit(msm_ctx, v) for v in vs]

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
