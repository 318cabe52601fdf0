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

@jax.jit
def probe(r):
    leaves = jax.tree_util.tree_leaves(r)
    return sum(l.ravel()[0].astype(jnp.uint32) for l in leaves)

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
slope("phase_a (2x64B-row takes)", pa, (ctx.tbl, vals))

# raw takes on the exact tables
tx, ty = ctx.tbl
idx = (vals & jnp.uint32(0x7FFFFFFF)).astype(jnp.int32)
tk = jax.jit(lambda t, i: jnp.take(t, i, axis=0))
slope("raw take x-table", tk, (tx, idx))
tk2 = jax.jit(lambda a, b, i: (jnp.take(a, i, axis=0), jnp.take(b, i, axis=0)))
slope("two takes one jit", tk2, (tx, ty, idx))

# interleaved single take: [2*n8, 16], idx2 = [2i, 2i+1]
tbl_i = jnp.stack([tx, ty], axis=1).reshape(2 * tx.shape[0], 16)
@jax.jit
def take_interleaved(t, i):
    i2 = jnp.stack([2 * i, 2 * i + 1], axis=1).reshape(-1)
    return jnp.take(t, i2, axis=0)
slope("interleaved single take (2M x 64B)", take_interleaved, (tbl_i, idx))
