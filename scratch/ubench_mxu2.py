#!/usr/bin/env python3
import os, sys, time
repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, repo)
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", os.path.join(repo, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

def run_matmul(name, dtype, M, Kd, N):
    acc_dtype = jnp.int32 if dtype == jnp.int8 else jnp.float32
    a = jnp.asarray(np.random.randint(-3, 3, (M, Kd)), dtype=dtype)
    b = jnp.asarray(np.random.randint(-3, 3, (Kd, N)), dtype=dtype)
    @jax.jit
    def mm(a, b):
        return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())), preferred_element_type=acc_dtype)
    print(f"{name} compile...", flush=True)
    r = mm(a, b); r.block_until_ready()
    t0 = time.time(); reps = 5
    for _ in range(reps):
        r = mm(a, b)
    r.block_until_ready()
    dt = (time.time() - t0) / reps
    macs = M * Kd * N
    print(f"{name} [{M}x{Kd}]@[{Kd}x{N}]: {dt*1e3:9.2f} ms -> {macs/dt/1e12:8.1f} Tmac/s", flush=True)

run_matmul("int8 ntt", jnp.int8, 4224, 4224, 8192)
run_matmul("int8->int32 big", jnp.int8, 8192, 16384, 8192)
run_matmul("bf16->f32 big", jnp.bfloat16, 8192, 16384, 8192)
