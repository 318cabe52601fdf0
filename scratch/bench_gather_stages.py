import os, sys, time
repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, repo)
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", os.path.join(repo, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from plonkit_tpu.tpu import msm as M

n = 1 << 20
rng = np.random.default_rng(2)
x = jnp.asarray(rng.integers(0, 1 << 16, (16, n), dtype=np.uint32))
y = jnp.asarray(rng.integers(0, 1 << 16, (16, n), dtype=np.uint32))
inf = jnp.zeros((n,), dtype=bool)
ctx = M.MSMContext.from_device_affine(x, y, inf, c=13)
vals = jnp.asarray(rng.integers(0, n, (n,), dtype=np.uint32))
bstart = jnp.asarray(rng.integers(0, n // 8 - 50, (4096,), dtype=np.int32))

@jax.jit
def probe(r):
    return r.ravel()[0] + r.ravel()[-1]

def slope(name, fn, args, k1=2, k2=8):
    r = fn(*args); _ = jax.device_get(probe(r))
    def run(k):
        t0 = time.time()
        for _ in range(k):
            r = fn(*args)
        _ = jax.device_get(probe(r))
        return time.time() - t0
    run(1); t1, t2 = run(k1), run(k2)
    print(f"{name}: {(t2-t1)/(k2-k1)*1e3:8.2f} ms", flush=True)

pa = jax.jit(lambda t, v: M._phase_a(t, v))
sr = pa(ctx.tbl, vals)
slope("phase_a (128B rows)", pa, (ctx.tbl, vals))

@jax.jit
def blktr(sr):
    nb = sr.shape[0] // 8
    return sr.reshape(nb, 8, 32).transpose(0, 2, 1).reshape(nb, 256)
sr2 = blktr(sr)
slope("block transpose", blktr, (sr,))

@jax.jit
def pb(sr2, bstart):
    ids = jnp.minimum(bstart[None, :] + jax.lax.broadcasted_iota(jnp.int32, (44, 1), 0), sr2.shape[0] - 1)
    return jnp.take(sr2, ids.reshape(-1), axis=0)
slope("phase_b take (1KB rows x 180k)", pb, (sr2, bstart))
