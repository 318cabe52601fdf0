#!/usr/bin/env python3
"""Slope timing with a REAL sync (device_get). Constant overheads cancel."""
import os, sys, time
repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, repo)
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", os.path.join(repo, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from plonkit_tpu.tpu import ntt_mxu, ntt as ntt_mod
from plonkit_tpu.tpu.mont import FR

n = 1 << int(os.environ.get("N", "20"))
rng = np.random.default_rng(1)
limbs = rng.integers(0, 1 << 16, (16, n), dtype=np.uint32); limbs[15] &= 0x2fff
x = jnp.asarray(limbs)

@jax.jit
def probe(v):
    return v[0, 0] + v[0, 1]

def slope(name, fn, k1=2, k2=10):
    r = fn(x); _ = jax.device_get(probe(r))   # compile + sync
    def run(k):
        t0 = time.time()
        r = x
        for _ in range(k):
            r = fn(r)
        _ = jax.device_get(probe(r))
        return time.time() - t0
    run(1)
    t1 = run(k1); t2 = run(k2)
    print(f"{name}: t({k1})={t1*1e3:.1f}ms t({k2})={t2*1e3:.1f}ms -> slope {(t2-t1)/(k2-k1)*1e3:8.2f} ms/call", flush=True)
    return (t2-t1)/(k2-k1)

slope("mxu ntt", lambda v: ntt_mxu.ntt_mxu(v))
slope("pease ntt", lambda v: ntt_mod.ntt(v))
