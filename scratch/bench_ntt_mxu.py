#!/usr/bin/env python3
import os, sys, time
repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, repo)
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", os.path.join(repo, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from plonkit_tpu.fields import FR_MODULUS
from plonkit_tpu.tpu import ntt as ntt_mod, ntt_mxu
from plonkit_tpu.tpu.mont import FR

LOG2N = int(os.environ.get("N", "20"))
n = 1 << LOG2N
print(f"n = 2^{LOG2N}", flush=True)
rng = np.random.default_rng(1)
# valid field elements: random 253-bit
vals_lo = rng.integers(0, 1 << 62, n, dtype=np.uint64)
vals = [(int(v) * 0x9e3779b97f4a7c15) % FR_MODULUS for v in vals_lo[:4]]
# build full array fast: random u16 limbs then mask top to keep < p
limbs = rng.integers(0, 1 << 16, (16, n), dtype=np.uint32)
limbs[15] &= 0x2fff   # < 2^254ish, below p's top limb 0x3064 -> canonical
x = jnp.asarray(limbs)

def timeit(name, fn, reps=3):
    t0 = time.time()
    r = fn(x)
    r.block_until_ready()
    # force dependency-chained sync via tiny device_get
    _ = jax.device_get(r[0, :1])
    t_first = time.time() - t0
    t0 = time.time()
    for _ in range(reps):
        r = fn(r)
    _ = jax.device_get(r[0, :1])
    dt = (time.time() - t0) / reps
    print(f"{name}: first {t_first:.1f}s, warm {dt*1e3:.1f} ms", flush=True)

t0=time.time(); ntt_mxu._device_tables(n, False); print(f"tables built in {time.time()-t0:.1f}s", flush=True)
timeit("mxu ntt", lambda v: ntt_mxu.ntt_mxu(v))
timeit("pease ntt", lambda v: ntt_mod.ntt(v))
