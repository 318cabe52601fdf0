#!/usr/bin/env python3
import os, sys, time
repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, repo)
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", os.path.join(repo, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from plonkit_tpu.tpu import ntt_mxu, pallas_kernels as pk
from plonkit_tpu.tpu.mont import FR, NLIMBS

n = 1 << 20
rng = np.random.default_rng(1)
limbs = rng.integers(0, 1 << 16, (16, n), dtype=np.uint32); limbs[15] &= 0x2fff
x = jnp.asarray(limbs)
tables_d, twiddles_d = ntt_mxu._device_tables(n, False)
radices = ntt_mxu.plan_radices(n)
mode = sys.argv[1]

def transform(x, radices, tables, twiddles):
    m = x.shape[1]; batch = x.shape[2]
    if len(radices) == 1:
        return base(x, m, tables[m])
    n1, n2 = radices[0], m // radices[0]
    s1 = transform(x.reshape(NLIMBS, n2, n1 * batch), radices[1:], tables, twiddles)
    s1 = s1.reshape(NLIMBS, n2, n1, batch)
    if mode != "notwiddle":
        tw = jnp.broadcast_to(twiddles[m][:, :, :, None], (NLIMBS, n2, n1, batch))
        c = pk.mul(FR, s1.reshape(NLIMBS, m * batch), tw.reshape(NLIMBS, m * batch))
    else:
        c = s1.reshape(NLIMBS, m * batch)
    c = c.reshape(NLIMBS, n2, n1, batch).transpose(0, 2, 1, 3)
    s2 = base(c.reshape(NLIMBS, n1, n2 * batch), n1, tables[n1])
    return s2.reshape(NLIMBS, n1, n2, batch).reshape(NLIMBS, m, batch)

def base(xx, r, table):
    batch = xx.shape[2]
    if mode == "nobalance":
        xb = jnp.concatenate([xx, xx, xx[:1]], axis=0).astype(jnp.int8)
    else:
        xb = ntt_mxu._to_balanced(xx)
    xb = xb.transpose(1, 0, 2).reshape(r * 33, batch)
    if mode == "nodot":
        G = jnp.broadcast_to(xb.astype(jnp.int32)[:, None, :], (r * 33, 1, batch)).reshape(r, 33, batch)
    else:
        G = jax.lax.dot_general(table, xb, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32).reshape(r, 33, batch)
    if mode == "nofold":
        return (G[:, :16].transpose(1, 0, 2).astype(jnp.uint32) & 0x2fff)
    return ntt_mxu._fold_redc(G)

@jax.jit
def run(v, tables, twiddles):
    # chain 5 transforms inside one program; mask keeps values canonical
    for _ in range(5):
        v = transform(v[:, :, None], radices, tables, twiddles)[:, :, 0] & 0x2fff
    return v

r = run(x, tables_d, twiddles_d); jax.block_until_ready(r)
t0 = time.time(); reps = 2
for _ in range(reps):
    r = run(r, tables_d, twiddles_d)
jax.block_until_ready(r); _ = jax.device_get(r.ravel()[:1])
print(f"{mode}: {(time.time()-t0)/reps/5*1e3:8.2f} ms per transform", flush=True)
