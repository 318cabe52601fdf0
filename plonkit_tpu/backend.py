"""Compute backend abstraction.

The PLONK orchestration (setup/prover) is written against this small
interface; two implementations exist:

  * HostBackend -- pure python ints.  Correctness oracle + small circuits.
  * JaxBackend  -- JAX/Pallas TPU path (plonkit_tpu/tpu/), the production
    engine: vectorized Montgomery limb arithmetic, Pippenger MSM, sharded
    NTT.  (Replaces bellman's Worker thread pool, SURVEY §5.8.)

Both operate on Fr scalars as python ints at the interface boundary; the JAX
backend converts to/from device limb arrays internally and caches device
residents across calls.
"""

from typing import List, Sequence, Tuple

from .fields import FR_MODULUS as R, FR_GENERATOR, fr_inv
from .curve import g1_msm_host
from .plonk import poly_host


class HostBackend:
    name = "host"

    # -- NTT --------------------------------------------------------------
    def ntt(self, values: Sequence[int]) -> List[int]:
        return poly_host.ntt(list(values))

    def intt(self, values: Sequence[int]) -> List[int]:
        return poly_host.intt(list(values))

    def coset_ntt(self, coeffs: Sequence[int], shift: int = FR_GENERATOR) -> List[int]:
        return poly_host.coset_ntt(list(coeffs), shift)

    def coset_intt(self, values: Sequence[int], shift: int = FR_GENERATOR) -> List[int]:
        return poly_host.coset_intt(list(values), shift)

    def coset_lde(self, coeffs: Sequence[int], factor: int, shift: int = FR_GENERATOR) -> List[int]:
        """Evaluate a degree-<n polynomial on the coset shift*H' of size factor*n."""
        ext = list(coeffs) + [0] * ((factor - 1) * len(coeffs))
        return poly_host.coset_ntt(ext, shift)

    # -- MSM --------------------------------------------------------------
    def msm(self, bases, scalars: Sequence[int]):
        return g1_msm_host(bases, list(scalars))

    # -- elementwise ------------------------------------------------------
    def mul(self, a: Sequence[int], b: Sequence[int]) -> List[int]:
        return [x * y % R for x, y in zip(a, b)]

    def add(self, a: Sequence[int], b: Sequence[int]) -> List[int]:
        return [(x + y) % R for x, y in zip(a, b)]

    def sub(self, a: Sequence[int], b: Sequence[int]) -> List[int]:
        return [(x - y) % R for x, y in zip(a, b)]

    def scale(self, a: Sequence[int], k: int) -> List[int]:
        return [x * k % R for x in a]

    def add_scalar(self, a: Sequence[int], k: int) -> List[int]:
        return [(x + k) % R for x in a]

    def grand_product(self, factors: Sequence[int]) -> List[int]:
        """Shifted prefix product: out[0] = 1, out[i] = prod(factors[:i])."""
        out = [1] * len(factors)
        for i in range(1, len(factors)):
            out[i] = out[i - 1] * factors[i - 1] % R
        return out

    def batch_inverse(self, values: Sequence[int]) -> List[int]:
        from .fields import batch_inverse
        return batch_inverse(list(values), R)

    def poly_eval(self, coeffs: Sequence[int], x: int) -> int:
        return poly_host.poly_eval(list(coeffs), x)


_default = None


def default_backend():
    global _default
    if _default is None:
        _default = HostBackend()
    return _default


def set_default_backend(b):
    global _default
    _default = b
