import random, time, os, sys
repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, repo)
import jax
jax.config.update("jax_compilation_cache_dir", os.path.join(repo, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp, numpy as np
from plonkit_tpu.curve import G1_GEN, g1_mul, g1_msm_host
from plonkit_tpu.fields import FR_MODULUS as R
from plonkit_tpu.tpu.msm import MSMContext

rng = random.Random(5)
n = 8192
print("building points...", flush=True)
pts = [g1_mul(G1_GEN, rng.randrange(1, R)) for _ in range(n)]
scalars = [rng.randrange(R) for _ in range(n)]
ctx = MSMContext(pts, c=13)
t0 = time.time()
got = ctx.msm(scalars)
print(f"device msm (incl compile): {time.time()-t0:.1f}s", flush=True)
want = g1_msm_host(pts, scalars)
assert got == want, f"MISMATCH\n{got}\n{want}"
print("TPU flat MSM == host MSM  OK", flush=True)
# second run timing
t0 = time.time(); got2 = ctx.msm(scalars); print(f"warm msm 2^13: {time.time()-t0:.2f}s", flush=True)
assert got2 == want
