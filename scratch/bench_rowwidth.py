import os, sys, time
repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, repo)
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", os.path.join(repo, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

n = 1 << 20
rng = np.random.default_rng(0)
idx = jnp.asarray(rng.integers(0, n, (n,), dtype=np.int32))

@jax.jit
def probe(r):
    return r.ravel()[0] + r.ravel()[-1]

def slope(name, fn, args, k1=2, k2=6):
    r = fn(*args); _ = jax.device_get(probe(r))
    def run(k):
        t0 = time.time()
        for _ in range(k):
            r = fn(*args)
        _ = jax.device_get(probe(r))
        return time.time() - t0
    run(1); t1, t2 = run(k1), run(k2)
    per = (t2-t1)/(k2-k1)
    print(f"{name}: {per*1e3:8.2f} ms ({per/n*1e9:5.1f} ns/row)", flush=True)

for W in (16, 32, 36, 48, 64, 128):
    tbl = jnp.asarray(rng.integers(0, 2**32, (n, W), dtype=np.uint32))
    fn = jax.jit(lambda t, i: jnp.take(t, i, axis=0))
    slope(f"take W={W} ({W*4}B rows)", fn, (tbl, idx))
