#!/usr/bin/env python3
import os, sys, time
repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, repo)
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", os.path.join(repo, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from plonkit_tpu.tpu import ntt_mxu, pallas_kernels as pk
from plonkit_tpu.tpu.mont import FR

n = 1 << 20
rng = np.random.default_rng(1)
limbs = rng.integers(0, 1 << 16, (16, n), dtype=np.uint32); limbs[15] &= 0x2fff
x = jnp.asarray(limbs)
mode = sys.argv[1]

if mode == "notwiddle":
    ntt_mxu.pk = type("fake", (), {"mul": staticmethod(lambda spec, a, b, **kw: a)})
elif mode == "nobalance":
    real = ntt_mxu._to_balanced
    ntt_mxu._to_balanced = lambda xx: jnp.concatenate(
        [xx.astype(jnp.int8), xx.astype(jnp.int8), xx[:1].astype(jnp.int8)], axis=0)
elif mode == "nofold":
    ntt_mxu._fold_redc = lambda G: G[:, :16].transpose(1, 0, 2).astype(jnp.uint32) & 0xffff

fn = lambda v: ntt_mxu.ntt_mxu(v)
r = fn(x); jax.block_until_ready(r)
t0 = time.time(); reps = 5
for _ in range(reps):
    r = fn(r & 0x2fff)
jax.block_until_ready(r); _ = jax.device_get(r.ravel()[:1])
print(f"{mode}: {(time.time()-t0)/reps*1e3:8.2f} ms", flush=True)
