#!/usr/bin/env python3
"""Microbenchmark of the Montgomery-mul kernel variants on the real TPU.

Times K chained muls over a VMEM-resident [16, T] block inside one pallas
kernel, reporting ns per (field mul x element).  This is the floor the MSM
sweep is built on: add_mixed_unchecked is ~11 muls, so
    sweep_time ~ W * r_max * lanes * 11 * (per-elem mul cost)
Variants:
  sos   mont.mont_mul       (current production kernel math)
  cios  mont2.mont_mul_cios (sublane-vectorized accumulator, unwired)
"""

import os
import sys
import time
from functools import partial

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


def make_kernel(mul):
    """K rounds of CHAINS independent muls per round (ILP so the VPU
    pipeline fills; a single dependent chain measures latency instead)."""
    def body(a_ref, b_ref, o_ref):
        b = b_ref[...]
        accs = [a_ref[...] for _ in range(CHAINS)]
        # distinct starting values per chain so nothing folds away
        for j in range(1, CHAINS):
            accs[j] = mul(FQ, accs[j - 1], b)

        def step(_, accs):
            return tuple(mul(FQ, a, b) for a in accs)

        accs = jax.lax.fori_loop(0, K, step, tuple(accs))
        out = accs[0]
        for a in accs[1:]:
            out = mont.add(FQ, out, a)
        o_ref[...] = out

    spec = pl.BlockSpec((NLIMBS, T), lambda i: (0, i))
    return jax.jit(pl.pallas_call(
        body,
        grid=(GRID,),
        in_specs=[spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((NLIMBS, T * GRID), jnp.uint32),
    ))


def _sync(r):
    jax.device_get(r[0, 0])


def run(name, mul):
    import random as pyrandom
    prng = pyrandom.Random(1)
    vals = [prng.randrange(FQ.p) for _ in range(T * GRID)]
    a = jnp.asarray(FQ.to_mont_np(vals))
    b = jnp.asarray(FQ.to_mont_np(vals[::-1]))
    fn = make_kernel(mul)
    r = fn(a, b)
    _sync(r)
    t0 = time.time()
    reps = 5
    for _ in range(reps):
        r = fn(a, b)
        _sync(r)
    dt = (time.time() - t0) / reps
    per = dt / (K * CHAINS * T * GRID)
    print(f"{name:6s} K={K}x{CHAINS} T={T} grid={GRID}: {dt*1e3:8.2f} ms "
          f"-> {per*1e9:7.2f} ns/(mul*elem)", flush=True)
    return per


if __name__ == "__main__":
    print(f"devices: {jax.devices()}", flush=True)
    variants = os.environ.get("UB_VARIANTS", "sos,cios").split(",")
    if "sos" in variants:
        run("sos", mont.mont_mul_sos)
    if "cios" in variants:
        run("cios", mont.mont_mul)

    # raw-op throughput probes: each "mul" is N_RAW elementwise ops on the
    # same [16, T] block, giving ns per raw vector op elem
    N_RAW = 64

    def raw_u32mul(spec, a, b):
        x = a
        for _ in range(N_RAW):
            x = x * b + jnp.uint32(1)
        return x

    def raw_u32add(spec, a, b):
        x = a
        for _ in range(N_RAW):
            x = (x + b) ^ jnp.uint32(1)
        return x

    def raw_u32maskshift(spec, a, b):
        x = a
        for _ in range(N_RAW // 2):
            x = (x & jnp.uint32(0xFFFF)) + b
            x = (x >> jnp.uint32(3)) + a
        return x

    if "raw" in variants:
        for nm, fn in (("u32mul", raw_u32mul), ("u32add", raw_u32add),
                       ("mask", raw_u32maskshift)):
            per = run(nm, fn)
            print(f"   -> {per*1e9/N_RAW*1000:7.2f} ps per raw elem op",
                  flush=True)
