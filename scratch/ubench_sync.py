import os, sys, time
repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, repo)
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", os.path.join(repo, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

M = Kd = N = 4096
a = jnp.asarray(np.random.randint(-3, 3, (M, Kd)), dtype=jnp.int8)
b = jnp.asarray(np.random.randint(-3, 3, (Kd, N)), dtype=jnp.int8)

from functools import partial
@partial(jax.jit, static_argnums=2)
def mm_chain(a, b, iters):
    def step(bcur, _):
        r = jax.lax.dot_general(a, bcur, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32)
        return (r & 3).astype(jnp.int8), ()
    bout, _ = jax.lax.scan(step, b, None, length=iters)
    return bout

for iters in (1, 8, 64):
    fn = lambda: mm_chain(a, b, iters)
    r = fn(); r.block_until_ready()
    t0 = time.time()
    r = fn(); r.block_until_ready()
    t_block = time.time() - t0
    t0 = time.time()
    val = jax.device_get(mm_chain(a, b, iters)[0, 0])
    t_get = time.time() - t0
    macs = M * Kd * N * iters
    print(f"iters={iters}: block={t_block*1e3:8.2f}ms get={t_get*1e3:8.2f}ms -> {macs/t_get/1e12:7.1f} Tmac/s (get-based)", flush=True)
