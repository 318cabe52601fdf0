#!/usr/bin/env python3
"""Microbenchmark: raw VPU op rates (u32 mul / fp32 fma) and MXU int8/bf16
matmul throughput on the real chip.  These numbers size the round-3 kernel
designs (matmul NTT, batched-affine MSM, fp32-limb experiments)."""

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


def bench(fn, args, n_work, unit, reps=5):
    r = fn(*args)
    jax.block_until_ready(r)
    t0 = time.time()
    for _ in range(reps):
        r = fn(*args)
    jax.block_until_ready(r)
    dt = (time.time() - t0) / reps
    print(f"  {dt*1e3:9.3f} ms -> {n_work/dt/1e12:8.3f} T{unit}/s", flush=True)
    return dt


K = 256            # chained rounds inside kernel
T = 512
GRID = 16
CHAINS = 4


def make_vpu_kernel(op, dtype):
    def body(a_ref, b_ref, o_ref):
        b = b_ref[...]
        accs = [a_ref[...] + dtype(j) for j in range(CHAINS)]

        def step(_, accs):
            return tuple(op(a, b) for a in accs)

        accs = jax.lax.fori_loop(0, K, step, tuple(accs))
        out = accs[0]
        for a in accs[1:]:
            out = out + a
        o_ref[...] = out

    spec = pl.BlockSpec((16, T), lambda i: (0, i))
    return jax.jit(pl.pallas_call(
        body, grid=(GRID,), in_specs=[spec, spec], out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((16, T * GRID), dtype)))


def run_vpu(name, op, dtype, ops_per_step):
    fn = make_vpu_kernel(op, dtype)
    a = jnp.asarray(np.random.randint(1, 1000, (16, T * GRID)), dtype=dtype)
    b = jnp.asarray(np.random.randint(1, 1000, (16, T * GRID)), dtype=dtype)
    n_ops = K * CHAINS * 16 * T * GRID * ops_per_step
    print(f"{name}:", flush=True)
    bench(fn, (a, b), n_ops, "op")


def run_matmul(name, dtype, M, Kd, N, acc_dtype):
    a = jnp.asarray(np.random.randint(-3, 3, (M, Kd)), dtype=dtype)
    b = jnp.asarray(np.random.randint(-3, 3, (Kd, N)), dtype=dtype)

    @jax.jit
    def mm(a, b):
        return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                                   preferred_element_type=acc_dtype)

    print(f"{name} [{M}x{Kd}]@[{Kd}x{N}]:", flush=True)
    bench(mm, (a, b), 2 * M * Kd * N, "mac")


if __name__ == "__main__":
    print(f"devices: {jax.devices()}", flush=True)
    run_vpu("u32 mul", lambda a, b: a * b, jnp.uint32, 1)
    run_vpu("u32 mul+add+shift mix", lambda a, b: ((a * b) & jnp.uint32(0xFFFF)) + (a >> 16), jnp.uint32, 4)
    run_vpu("u32 add", lambda a, b: a + b, jnp.uint32, 1)
    run_vpu("fp32 fma", lambda a, b: a * b + jnp.float32(1.5), jnp.float32, 2)
    run_vpu("fp32 mul", lambda a, b: a * b, jnp.float32, 1)
    run_matmul("int8->int32", jnp.int8, 4096, 4096, 4096, jnp.int32)
    run_matmul("bf16->f32", jnp.bfloat16, 4096, 4096, 4096, jnp.float32)
    run_matmul("f32->f32", jnp.float32, 4096, 4096, 4096, jnp.float32)
    # the NTT shape of interest
    run_matmul("int8 ntt-shape", jnp.int8, 4224, 4224, 8192, jnp.int32)
