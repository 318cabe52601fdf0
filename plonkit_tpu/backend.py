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

    # -- scans / reductions -----------------------------------------------
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


_default = None


def default_backend():
    global _default
    if _default is None:
        _default = HostBackend()
    return _default


def set_default_backend(b):
    global _default
    _default = b
