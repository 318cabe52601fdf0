"""Pallas TPU kernels for the hot field operations.

XLA does not fuse the ~2.5k-op Montgomery limb graphs well (measured ~150
HBM round-trips per mont_mul at 2^22); these kernels keep a [16, TILE] limb
block resident in VMEM so the whole multiply is one HBM pass, turning the
operation compute-bound on the VPU.

Kernels reuse the limb algorithms from mont.py verbatim (jnp ops lower to
Mosaic inside the kernel), so correctness is inherited from the host-oracle
tests.  Every kernel has interpret-mode support for CPU testing.
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import mont
from .mont import NLIMBS, FieldSpec

# 1024 lanes/tile: block = 16 x 1024 u32 = 64 KiB; a 3-operand kernel uses
# <256 KiB VMEM, far under the ~16 MiB budget, letting the pipeline double-buffer.
DEFAULT_TILE = 1024


def _pad_to(x, tile):
    n = x.shape[-1]
    rem = n % tile
    if rem == 0:
        return x, n
    pad = tile - rem
    return jnp.pad(x, ((0, 0), (0, pad))), n


_KERNEL_CACHE = {}


def _get_kernel(body_name, spec, tile, n_padded, num_inputs, num_outputs, interpret):
    """Cache pallas_call callables so JAX's compilation cache is hit across
    calls (a fresh callable per call would recompile the Mosaic kernel every
    time -- measured ~20s per compile)."""
    key = (body_name, id(spec), tile, n_padded, num_inputs, num_outputs, interpret)
    fn = _KERNEL_CACHE.get(key)
    if fn is None:
        body = partial(globals()[body_name], spec)
        grid = (n_padded // tile,)
        bspec = pl.BlockSpec((NLIMBS, tile), lambda i: (0, i))
        out_shape = [jax.ShapeDtypeStruct((NLIMBS, n_padded), jnp.uint32) for _ in range(num_outputs)]
        out_specs = [bspec] * num_outputs
        if num_outputs == 1:
            out_shape, out_specs = out_shape[0], out_specs[0]
        fn = jax.jit(pl.pallas_call(
            body,
            grid=grid,
            in_specs=[bspec] * num_inputs,
            out_specs=out_specs,
            out_shape=out_shape,
            interpret=interpret,
        ))
        _KERNEL_CACHE[key] = fn
    return fn


# jnp fallbacks: same limb algorithms without the pallas wrapper.  Used
# automatically on the CPU backend (Mosaic kernels don't run there and
# interpret mode is orders of magnitude slower); the pallas path runs on TPU
# and under explicit interpret=True (kernel-correctness tests).
_JNP_FALLBACK = {
    "_mul_body": lambda spec, a, b: mont.mont_mul(spec, a, b),
    "_add_body": lambda spec, a, b: mont.add(spec, a, b),
    "_sub_body": lambda spec, a, b: mont.sub(spec, a, b),
    "_mul_add_body": lambda spec, a, b, c: mont.add(spec, mont.mont_mul(spec, a, b), c),
    "_butterfly_body": lambda spec, lo, hi, w: (
        lambda t: (mont.add(spec, lo, t), mont.sub(spec, lo, t))
    )(mont.mont_mul(spec, w, hi)),
    "_butterfly_dif_body": lambda spec, lo, hi, w: (
        mont.add(spec, lo, hi),
        mont.mont_mul(spec, w, mont.sub(spec, lo, hi)),
    ),
}


def _use_jnp_fallback():
    try:
        return jax.default_backend() == "cpu"
    except Exception:
        return False


def _elementwise_call(body_name, spec, args, tile, interpret, num_outputs=1):
    n = args[0].shape[-1]
    if n == 0:  # associative_scan recursion hits empty slices
        empty = args[0][:, :0]
        return empty if num_outputs == 1 else (empty,) * num_outputs
    if not interpret and _use_jnp_fallback():
        return _JNP_FALLBACK[body_name](spec, *args)
    tile = min(tile, max(128, 1 << (n - 1).bit_length()))
    padded = [_pad_to(a, tile)[0] for a in args]
    n_padded = padded[0].shape[-1]
    fn = _get_kernel(body_name, spec, tile, n_padded, len(args), num_outputs, interpret)
    res = fn(*padded)
    if num_outputs == 1:
        return res[:, :n]
    return tuple(r[:, :n] for r in res)


# ---------------------------------------------------------------------------
# kernel bodies
# ---------------------------------------------------------------------------

def _mul_body(spec, a_ref, b_ref, o_ref):
    o_ref[...] = mont.mont_mul(spec, a_ref[...], b_ref[...])


def _add_body(spec, a_ref, b_ref, o_ref):
    o_ref[...] = mont.add(spec, a_ref[...], b_ref[...])


def _sub_body(spec, a_ref, b_ref, o_ref):
    o_ref[...] = mont.sub(spec, a_ref[...], b_ref[...])


def _mul_add_body(spec, a_ref, b_ref, c_ref, o_ref):
    o_ref[...] = mont.add(spec, mont.mont_mul(spec, a_ref[...], b_ref[...]), c_ref[...])


def _butterfly_body(spec, lo_ref, hi_ref, w_ref, out_lo_ref, out_hi_ref):
    """Radix-2 DIT butterfly: t = w * hi; (lo + t, lo - t)."""
    lo = lo_ref[...]
    t = mont.mont_mul(spec, w_ref[...], hi_ref[...])
    out_lo_ref[...] = mont.add(spec, lo, t)
    out_hi_ref[...] = mont.sub(spec, lo, t)


def _butterfly_dif_body(spec, lo_ref, hi_ref, w_ref, out_u_ref, out_v_ref):
    """Radix-2 DIF butterfly: (lo + hi, (lo - hi) * w)."""
    lo = lo_ref[...]
    hi = hi_ref[...]
    out_u_ref[...] = mont.add(spec, lo, hi)
    out_v_ref[...] = mont.mont_mul(spec, w_ref[...], mont.sub(spec, lo, hi))


# ---------------------------------------------------------------------------
# public entry points
# ---------------------------------------------------------------------------

def mul(spec: FieldSpec, a, b, tile=DEFAULT_TILE, interpret=False):
    return _elementwise_call('_mul_body', spec, (a, b), tile, interpret)


def add(spec: FieldSpec, a, b, tile=DEFAULT_TILE, interpret=False):
    return _elementwise_call('_add_body', spec, (a, b), tile, interpret)


def sub(spec: FieldSpec, a, b, tile=DEFAULT_TILE, interpret=False):
    return _elementwise_call('_sub_body', spec, (a, b), tile, interpret)


def mul_add(spec: FieldSpec, a, b, c, tile=DEFAULT_TILE, interpret=False):
    return _elementwise_call('_mul_add_body', spec, (a, b, c), tile, interpret)


def butterfly(spec: FieldSpec, lo, hi, w, tile=DEFAULT_TILE, interpret=False):
    return _elementwise_call('_butterfly_body', spec, (lo, hi, w), tile, interpret, num_outputs=2)


def butterfly_dif(spec: FieldSpec, lo, hi, w, tile=DEFAULT_TILE, interpret=False):
    return _elementwise_call('_butterfly_dif_body', spec, (lo, hi, w), tile, interpret, num_outputs=2)


def batch_inverse(spec: FieldSpec, v, interpret: bool = False):
    """Montgomery batch inversion over any field spec (zeros map to zero):
    inclusive prefix/suffix product scans (Hillis-Steele fori, one mul per
    round), ONE tiny scalar Fermat, two combining muls.  The elementwise
    Fermat ladder (254 unfused CIOS rounds over the whole vector) measured
    12.4 s at 2^20 on v5e; this is ~44 full-width muls (~0.1 s).  Must be
    called under jit (or traced into one)."""
    n = v.shape[1]
    one = jnp.broadcast_to(
        jnp.asarray(spec.one_mont_limbs[:, None], dtype=jnp.uint32), v.shape)
    zero_mask = jnp.all(v == 0, axis=0)
    x = jnp.where(zero_mask[None], one, v)
    rounds = max(1, (n - 1).bit_length())

    def scan(arr, suffix):
        def body(i, pacc):
            d = jnp.int32(1) << i
            cols = jax.lax.broadcasted_iota(jnp.int32, (n,), 0)
            mask = cols < (n - d) if suffix else cols >= d
            rolled = jnp.roll(pacc, -d if suffix else d, axis=1)
            rolled = jnp.where(mask[None], rolled, one)
            return mul(spec, pacc, rolled, interpret=interpret)
        return jax.lax.fori_loop(0, rounds, body, arr)

    pre = scan(x, suffix=False)
    suf = scan(x, suffix=True)
    total_inv = mont.inverse(spec, pre[:, n - 1:n])
    pre_excl = jnp.concatenate([one[:, :1], pre[:, :n - 1]], axis=1)
    suf_excl = jnp.concatenate([suf[:, 1:], one[:, :1]], axis=1)
    out = mul(spec, pre_excl, suf_excl, interpret=interpret)
    out = mul(spec, out, jnp.broadcast_to(total_inv, v.shape),
              interpret=interpret)
    return jnp.where(zero_mask[None], 0, out)
