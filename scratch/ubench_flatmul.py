#!/usr/bin/env python3
"""Flat-limb Montgomery mul ubench: limbs as separate [8, T] vreg slices of
a [128, T] block (no concats / sublane shuffles in the CIOS loop), vs the
production planar [16, T] kernel.  Slope-timed with device_get sync."""

import os
import sys
import time

repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, repo)

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", os.path.join(repo, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from jax.experimental import pallas as pl

from plonkit_tpu.tpu import mont
from plonkit_tpu.tpu.mont import FQ, NLIMBS

K = int(os.environ.get("UB_K", "64"))
T = int(os.environ.get("UB_T", "512"))
GRID = int(os.environ.get("UB_GRID", "8"))
CHAINS = int(os.environ.get("UB_CHAINS", "4"))

MASK = 0xFFFF
PP_I = int(FQ.pprime)
P_INTS = [int(v) for v in FQ.p_limbs]


def mont_mul_flat(a, b):
    """a, b: lists of 16 [8, T] u32 arrays (limb-unrolled). CIOS."""
    Tacc = [jnp.zeros_like(a[0]) for _ in range(NLIMBS + 1)]
    for i in range(NLIMBS):
        ai = a[i]
        for j in range(NLIMBS):
            prod = ai * b[j]
            Tacc[j] = Tacc[j] + (prod & MASK)
            Tacc[j + 1] = Tacc[j + 1] + (prod >> 16)
        m = ((Tacc[0] & MASK) * jnp.uint32(PP_I)) & MASK
        for j in range(NLIMBS):
            prod = m * jnp.uint32(P_INTS[j])
            Tacc[j] = Tacc[j] + (prod & MASK)
            Tacc[j + 1] = Tacc[j + 1] + (prod >> 16)
        Tacc = [Tacc[1] + (Tacc[0] >> 16)] + Tacc[2:] + [jnp.zeros_like(a[0])]
    # carry ripple
    out = []
    carry = jnp.zeros_like(a[0])
    for i in range(NLIMBS):
        c = Tacc[i] + carry
        out.append(c & MASK)
        carry = c >> 16
    # conditional subtract p
    sub = []
    borrow = jnp.zeros_like(a[0])
    for i in range(NLIMBS):
        d = out[i] - jnp.uint32(P_INTS[i]) - borrow
        borrow = d >> 31
        sub.append(d & MASK)
    need = borrow == 0
    return [jnp.where(need, s, o) for s, o in zip(sub, out)]


def make_flat_kernel():
    def body(a_ref, b_ref, o_ref):
        a = [a_ref[8 * i:8 * (i + 1), :] for i in range(NLIMBS)]
        b = [b_ref[8 * i:8 * (i + 1), :] for i in range(NLIMBS)]
        accs = [a]
        for j in range(1, CHAINS):
            accs.append(mont_mul_flat(accs[-1], b))

        def step(_, accs):
            return tuple(tuple(mont_mul_flat(list(x), b)) for x in accs)

        accs = jax.lax.fori_loop(0, K, step, tuple(tuple(x) for x in accs))
        out = accs[0]
        for acc in accs[1:]:
            out = [x + y for x, y in zip(out, acc)]  # cheap mix (u32 wraps)
        for i in range(NLIMBS):
            o_ref[8 * i:8 * (i + 1), :] = out[i]

    spec = pl.BlockSpec((8 * NLIMBS, T), lambda i: (0, i))
    return jax.jit(pl.pallas_call(
        body, grid=(GRID,), in_specs=[spec, spec], out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((8 * NLIMBS, T * GRID), jnp.uint32)))


def make_planar_kernel():
    def body(a_ref, b_ref, o_ref):
        b = b_ref[...]
        accs = [a_ref[...]]
        for j in range(1, CHAINS):
            accs.append(mont.mont_mul(FQ, accs[-1], b))

        def step(_, accs):
            return tuple(mont.mont_mul(FQ, x, b) for x in accs)

        accs = jax.lax.fori_loop(0, K, step, tuple(accs))
        out = accs[0]
        for acc in accs[1:]:
            out = mont.add(FQ, out, acc)
        o_ref[...] = out

    spec = pl.BlockSpec((NLIMBS, T), lambda i: (0, i))
    return jax.jit(pl.pallas_call(
        body, grid=(GRID,), in_specs=[spec, spec], out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((NLIMBS, T * GRID), jnp.uint32)))


@jax.jit
def probe(v):
    return v[0, 0] + v[1, 1]


def slope_run(name, fn, a, b, elems_per_call):
    r = fn(a, b)
    _ = jax.device_get(probe(r))

    def run(k):
        t0 = time.time()
        r = a
        for _ in range(k):
            r = fn(r, b)
        _ = jax.device_get(probe(r))
        return time.time() - t0

    run(1)
    k1, k2 = 2, 10
    t1, t2 = run(k1), run(k2)
    per_call = (t2 - t1) / (k2 - k1)
    muls = K * CHAINS * elems_per_call
    print(f"{name}: {per_call*1e3:8.2f} ms/call -> {muls/per_call/1e6:8.1f} M muls/s"
          f"  ({per_call/muls*1e9:6.2f} ns/mul)", flush=True)


if __name__ == "__main__":
    print(f"devices: {jax.devices()}  K={K} CHAINS={CHAINS} T={T} GRID={GRID}", flush=True)
    import random as pyr
    prng = pyr.Random(1)
    vals = [prng.randrange(FQ.p) for _ in range(T * GRID)]
    ap = jnp.asarray(FQ.to_mont_np(vals))
    bp = jnp.asarray(FQ.to_mont_np(vals[::-1]))
    # flat layout: limb i -> rows 8i..8i+8 ([16, N] -> [16, 8, N/8] -> [128, N/8])
    n = T * GRID
    af = jnp.asarray(np.asarray(FQ.to_mont_np(vals * 8)).reshape(16, 8, n)).reshape(128, n)
    bf = jnp.asarray(np.asarray(FQ.to_mont_np(vals[::-1] * 8)).reshape(16, 8, n)).reshape(128, n)
    slope_run("planar", make_planar_kernel(), ap, bp, T * GRID)
    slope_run("flat  ", make_flat_kernel(), af, bf, 8 * T * GRID)
