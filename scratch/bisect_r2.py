#!/usr/bin/env python3
"""Synced bisect of prover round 2 at 2^20 on TPU: each op block_until_ready."""
import os, sys, time, random
repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, repo)
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", os.path.join(repo, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from plonkit_tpu.backend_jax import JaxBackend, FrVec
from plonkit_tpu.fields import FR_MODULUS as R, get_domain_omega
from plonkit_tpu.plonk.setup import K_COLS, STATE_WIDTH

bk = JaxBackend()
n = 1 << 20
rng = np.random.default_rng(0)

def rnd():
    raw = rng.integers(0, 1 << 16, size=(16, n), dtype=np.uint32)
    raw[15] = 0
    return FrVec(jnp.asarray(raw))

wires_v = [rnd() for _ in range(4)]
sigma_v = [rnd() for _ in range(4)]
omega_pows = bk.powers(get_domain_omega(n), n)
omega_pows.data.block_until_ready()
beta, gamma = 123456789, 987654321

def sync(x):
    x.data.block_until_ready()

def timed(name, fn, reps=2):
    r = fn(); sync(r)
    t0 = time.time()
    for _ in range(reps):
        r = fn(); sync(r)
    print(f"{name}: {(time.time()-t0)/reps*1e3:9.1f} ms", flush=True)
    return r

b = bk
def terms():
    num = None; den = None
    for j in range(STATE_WIDTH):
        kj_beta = K_COLS[j] * beta % R
        term_n = b.add_scalar(b.scale_add(omega_pows, kj_beta, wires_v[j]), gamma)
        term_d = b.add_scalar(b.scale_add(sigma_v[j], beta, wires_v[j]), gamma)
        num = term_n if num is None else b.mul(num, term_n)
        den = term_d if den is None else b.mul(den, term_d)
    return num, den

t0=time.time(); num, den = terms(); sync(num); sync(den)
print(f"terms (first): {time.time()-t0:.2f}s", flush=True)
t0=time.time(); num, den = terms(); sync(num); sync(den)
print(f"terms (again): {time.time()-t0:.2f}s", flush=True)
inv = timed("batch_inverse", lambda: b.batch_inverse(den))
ratio = timed("mul ratio", lambda: b.mul(num, inv))
z = timed("grand_product", lambda: b.grand_product(ratio))
zm = timed("intt", lambda: b.intt(z))
