"""Host (python-int) polynomial utilities over Fr: reference implementations
used by the setup path at small sizes and as the correctness oracle for the
TPU kernels (plonkit_tpu/tpu/ntt.py)."""

from typing import List

from ..fields import FR_MODULUS as R, FR_GENERATOR, fr_inv, get_domain_omega


def _bit_reverse_permute(a: List[int]) -> List[int]:
    n = len(a)
    bits = n.bit_length() - 1
    out = [0] * n
    for i in range(n):
        j = int(format(i, f"0{bits}b")[::-1], 2) if bits else 0
        out[j] = a[i]
    return out


def ntt(values: List[int], omega: int = None) -> List[int]:
    """In-order radix-2 NTT: returns [p(w^0), p(w^1), ...] from coefficients."""
    n = len(values)
    assert n & (n - 1) == 0
    if omega is None:
        omega = get_domain_omega(n)
    a = _bit_reverse_permute(values)
    size = 2
    while size <= n:
        w_step = pow(omega, n // size, R)
        half = size // 2
        for start in range(0, n, size):
            w = 1
            for k in range(half):
                lo = a[start + k]
                hi = a[start + k + half] * w % R
                a[start + k] = (lo + hi) % R
                a[start + k + half] = (lo - hi) % R
            # fuse twiddle advance
                w = w * w_step % R
        size *= 2
    return a


def intt(values: List[int], omega: int = None) -> List[int]:
    """Inverse NTT: coefficients from evaluations on the domain."""
    n = len(values)
    if omega is None:
        omega = get_domain_omega(n)
    inv_omega = fr_inv(omega)
    out = ntt(list(values), inv_omega)
    inv_n = fr_inv(n)
    return [x * inv_n % R for x in out]


def poly_eval(coeffs: List[int], x: int) -> int:
    acc = 0
    for c in reversed(coeffs):
        acc = (acc * x + c) % R
    return acc


def coset_ntt(coeffs: List[int], shift: int = FR_GENERATOR) -> List[int]:
    """Evaluate on the coset shift * H (values of p(shift * w^i))."""
    n = len(coeffs)
    shifted = []
    s = 1
    for c in coeffs:
        shifted.append(c * s % R)
        s = s * shift % R
    return ntt(shifted)


def coset_intt(values: List[int], shift: int = FR_GENERATOR) -> List[int]:
    n = len(values)
    coeffs = intt(values)
    inv_s = fr_inv(shift)
    out = []
    s = 1
    for c in coeffs:
        out.append(c * s % R)
        s = s * inv_s % R
    return out
