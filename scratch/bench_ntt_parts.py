#!/usr/bin/env python3
import os, sys, time
repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, repo)
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", os.path.join(repo, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from functools import partial
from plonkit_tpu.tpu import ntt_mxu, pallas_kernels as pk
from plonkit_tpu.tpu.mont import FR

n = 1 << 20
rng = np.random.default_rng(1)
limbs = rng.integers(0, 1 << 16, (16, n), dtype=np.uint32); limbs[15] &= 0x2fff
x = jnp.asarray(limbs)

def timed(name, fn, *args, reps=5):
    r = fn(*args); jax.block_until_ready(r)
    t0 = time.time()
    for _ in range(reps):
        r = fn(*args)
    jax.block_until_ready(r)
    leaf = jax.tree_util.tree_leaves(r)[0]
    _ = jax.device_get(leaf.ravel()[:1])
    dt = (time.time() - t0) / reps
    print(f"{name}: {dt*1e3:8.2f} ms", flush=True)
    return r

tob = jax.jit(ntt_mxu._to_balanced)
xb = timed("to_balanced 2^20", tob, x.reshape(16, 128, 8192))

tbl = jnp.asarray(ntt_mxu._dft_table_np(128, False))
xb2 = xb.transpose(1, 0, 2).reshape(128 * 33, 8192)
dot = jax.jit(lambda t, v: jax.lax.dot_general(t, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32))
G = timed("dot [4224x4224]@[4224x8192]", dot, tbl, xb2)

fold = jax.jit(ntt_mxu._fold_redc)
_ = timed("fold_redc", fold, G.reshape(128, 33, 8192))

tw = jnp.asarray(np.ascontiguousarray(limbs[:, ::-1])); 
mulk = jax.jit(lambda a, b: pk.mul(FR, a, b))
_ = timed("pk.mul twiddle pass", mulk, x, tw)

tr = jax.jit(lambda v: v.reshape(16, 8192, 128, 1).transpose(0, 2, 1, 3).reshape(16, n))
_ = timed("transpose pass", tr, x)

base = jax.jit(partial(ntt_mxu._dft_base, r=128, inverse=False, table=tbl))
_ = timed("dft_base full (r=128)", base, x.reshape(16, 128, 8192))
