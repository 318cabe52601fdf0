"""Compute backend abstraction.

The PLONK orchestration (setup/prover) is written against this interface;
two implementations exist:

  * HostBackend (here)  -- pure python ints; correctness oracle + small work.
  * backend_jax.JaxBackend -- the JAX/Pallas TPU path (production engine;
    replaces bellman's Worker thread pool, SURVEY §5.8).

Vectors are opaque handles: python lists for the host backend, device
FrVec limb arrays for the JAX backend.  Scalars cross the boundary as
python ints (they feed the byte-exact Fiat-Shamir transcript)."""

from typing import List, Sequence

from .curve import g1_msm_host
from .fields import FR_MODULUS as R, FR_GENERATOR, fr_inv
from .plonk import poly_host


class _HostMSMContext:
    def __init__(self, bases):
        self.bases = list(bases)
        self.n = len(self.bases)

    def msm(self, scalars):
        from .native import msm_native
        res = msm_native(self.bases, list(scalars))
        if res is not False:
            return res
        return g1_msm_host(self.bases, list(scalars))


class HostBackend:
    name = "host"

    # -- conversions ------------------------------------------------------
    def from_ints(self, values: Sequence[int], pad_to: int = None) -> List[int]:
        out = [v % R for v in values]
        if pad_to is not None and len(out) < pad_to:
            out += [0] * (pad_to - len(out))
        return out

    def to_ints(self, v) -> List[int]:
        return list(v)

    def commit(self, msm_ctx, v):
        """KZG-commit a backend vector over a prepared MSM context."""
        return msm_ctx.msm(self.to_ints(v))

    # -- memory placement (no-ops on host) ----------------------------------
    def offload(self, v):
        """Move a vector to host memory (device-memory relief)."""
        return v

    def onload(self, h):
        """Bring an offloaded vector back for compute."""
        return h

    # -- NTT --------------------------------------------------------------
    def ntt(self, values):
        return poly_host.ntt(list(values))

    def intt(self, values):
        return poly_host.intt(list(values))

    def coset_ntt(self, coeffs, shift: int = FR_GENERATOR):
        return poly_host.coset_ntt(list(coeffs), shift)

    def coset_intt(self, values, shift: int = FR_GENERATOR):
        return poly_host.coset_intt(list(values), shift)

    def coset_lde(self, coeffs, factor: int, shift: int = FR_GENERATOR):
        ext = list(coeffs) + [0] * ((factor - 1) * len(coeffs))
        return poly_host.coset_ntt(ext, shift)

    # -- MSM --------------------------------------------------------------
    def msm_context(self, bases, key=None):
        return _HostMSMContext(bases)

    def msm_context_from_crs(self, crs, size: int, key=None):
        return _HostMSMContext(crs.g1_bases[:size])

    def msm(self, bases, scalars):
        return g1_msm_host(bases, list(scalars))

    # -- elementwise ------------------------------------------------------
    def mul(self, a, b):
        return [x * y % R for x, y in zip(a, b)]

    def add(self, a, b):
        return [(x + y) % R for x, y in zip(a, b)]

    def sub(self, a, b):
        return [(x - y) % R for x, y in zip(a, b)]

    def scale(self, a, k: int):
        return [x * k % R for x in a]

    def add_scalar(self, a, k: int):
        return [(x + k) % R for x in a]

    def scale_add(self, a, k: int, c):
        return [(x * k + y) % R for x, y in zip(a, c)]

    def gate_residual(self, sel_v, wires_v, pi_vec):
        """Value-domain gate identity residual (the witness satisfaction
        check): q_a*a + q_b*b + q_c*c + q_d*d + q_m*a*b + q_const +
        q_dnext*rot(d) + PI.  Zero everywhere iff satisfied."""
        q, w = sel_v, wires_v
        acc = self.add(self.mul(q[0], w[0]), self.mul(q[1], w[1]))
        acc = self.add(acc, self.mul(q[2], w[2]))
        acc = self.add(acc, self.mul(q[3], w[3]))
        acc = self.add(acc, self.mul(q[4], self.mul(w[0], w[1])))
        acc = self.add(acc, q[5])
        acc = self.add(acc, self.mul(q[6], self.rotate(w[3], 1)))
        return self.add(acc, pi_vec)

    def any_nonzero(self, v) -> bool:
        return any(v)

    def quotient_column(self, sel_l, wires_l, d_next_l, z_l, z_next_l,
                        pi_l, x_coset, sigma_l, l0_l, vanishing_inv,
                        beta: int, gamma: int, alpha: int, k_cols):
        """Round 3's coset-domain elementwise pipeline as one composite op:
        t = (gate + alpha*perm + alpha^2*(z-1)*L0) * Z_H^-1 over the LDE
        domain.  Backends may fuse it into a single device program."""
        gate = self.mul(sel_l[0], wires_l[0])
        gate = self.add(gate, self.mul(sel_l[1], wires_l[1]))
        gate = self.add(gate, self.mul(sel_l[2], wires_l[2]))
        gate = self.add(gate, self.mul(sel_l[3], wires_l[3]))
        gate = self.add(gate, self.mul(sel_l[4],
                                       self.mul(wires_l[0], wires_l[1])))
        gate = self.add(gate, sel_l[5])
        gate = self.add(gate, self.mul(sel_l[6], d_next_l))
        gate = self.add(gate, pi_l)

        perm_num = z_l
        perm_den = z_next_l
        for j, k in enumerate(k_cols):
            kj_beta = k * beta % R
            perm_num = self.mul(perm_num, self.add_scalar(
                self.scale_add(x_coset, kj_beta, wires_l[j]), gamma))
            perm_den = self.mul(perm_den, self.add_scalar(
                self.scale_add(sigma_l[j], beta, wires_l[j]), gamma))
        perm = self.sub(perm_num, perm_den)

        alpha2 = alpha * alpha % R
        numerator = self.add(gate, self.scale(perm, alpha))
        z_minus_1_l0 = self.mul(self.add_scalar(z_l, R - 1), l0_l)
        numerator = self.add(numerator, self.scale(z_minus_1_l0, alpha2))
        return self.mul(numerator, vanishing_inv)

    # -- scans / reductions -----------------------------------------------
    def permutation_grand_product(self, omega_pows, sigma_v, wires_v,
                                  beta: int, gamma: int, k_cols):
        """The prover's round-2 pipeline as one composite op:
        z = grand_product( prod_j (k_j*beta*X + w_j + gamma)
                           / prod_j (beta*sigma_j + w_j + gamma) ).
        Backends may fuse it into a single device program."""
        num = None
        den = None
        for j, k in enumerate(k_cols):
            kj_beta = k * beta % R
            t_n = self.add_scalar(
                self.scale_add(omega_pows, kj_beta, wires_v[j]), gamma)
            t_d = self.add_scalar(
                self.scale_add(sigma_v[j], beta, wires_v[j]), gamma)
            num = t_n if num is None else self.mul(num, t_n)
            den = t_d if den is None else self.mul(den, t_d)
        return self.grand_product(self.mul(num, self.batch_inverse(den)))

    def grand_product(self, factors):
        out = [1] * len(factors)
        for i in range(1, len(factors)):
            out[i] = out[i - 1] * factors[i - 1] % R
        return out

    def batch_inverse(self, values):
        # per-element (zeros map to zero), matching the device semantics
        return [pow(v, -1, R) if v else 0 for v in values]

    def powers(self, base: int, n: int):
        out = [1] * n
        for i in range(1, n):
            out[i] = out[i - 1] * base % R
        return out

    def poly_eval(self, coeffs, x: int) -> int:
        return poly_host.poly_eval(list(coeffs), x)

    def divide_by_linear(self, coeffs, point: int):
        out = [0] * (len(coeffs) - 1)
        acc = 0
        for i in range(len(coeffs) - 1, 0, -1):
            acc = (acc * point + coeffs[i]) % R
            out[i - 1] = acc
        return out

    # -- structural -------------------------------------------------------
    def slice(self, v, start: int, stop: int):
        return list(v[start:stop])

    def concat(self, vs):
        out = []
        for v in vs:
            out.extend(v)
        return out

    def rotate(self, v, k: int):
        return list(v[k:]) + list(v[:k])

    def tile_small(self, values, total: int):
        reps = -(-total // len(values))
        return (list(values) * reps)[:total]

    def zeros(self, n: int):
        return [0] * n


def from_ints_dedup(backend, values, pad_to: int = None):
    """backend.from_ints with distinct-value limb conversion: setup
    polynomials (selectors, permutations) repeat a small set of
    coefficients over the whole domain, so converting each DISTINCT value
    to limbs once and numpy-gathering the column turns the ~1-2 s/vector
    python-int -> bytes cost of a 2^20 from_ints into milliseconds.
    make vk at 2^20 was 21.9 s of exactly this (11 commits x from_ints);
    the MSMs themselves were fine."""
    if not hasattr(backend, "from_raw_limbs"):
        return backend.from_ints(values, pad_to=pad_to)
    import numpy as np

    from .tpu.mont import FR
    uniq = {}
    n = len(values)
    total = pad_to if pad_to is not None and pad_to > n else n
    idx = np.empty(total, dtype=np.int64)
    for i, v in enumerate(values):
        j = uniq.get(v)
        if j is None:
            j = uniq[v] = len(uniq)
        idx[i] = j
    if total > n:
        z = uniq.get(0)
        if z is None:
            z = uniq[0] = len(uniq)
        idx[n:] = z
    limbs = FR.to_limbs_np(list(uniq))          # [16, n_distinct]
    return backend.from_raw_limbs(np.ascontiguousarray(limbs[:, idx]))


_default = None


def default_backend():
    global _default
    if _default is None:
        _default = HostBackend()
    return _default


def set_default_backend(b):
    global _default
    _default = b
