#!/usr/bin/env python3
"""Slope-timed takes at several row widths + r3-style fused take."""
import os, sys, time
repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, repo)
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", os.path.join(repo, ".jax_cache"))
N = 1 << 20

def sync(x):
    jax.device_get([l.ravel()[0] for l in jax.tree_util.tree_leaves(x)])

def t_of(fn, *args, reps=3):
    r = fn(*args); sync(r)
    t0 = time.time()
    for _ in range(reps):
        sync(fn(*args))
    return (time.time() - t0) / reps

def slope(make, *args):
    t1, t4 = t_of(make(1), *args), t_of(make(4), *args)
    return (t4 - t1) / 3

rng = np.random.default_rng(0)
idx = jnp.asarray(rng.permutation(N).astype(np.int32))
print(f"devices: {jax.devices()}", flush=True)
for W in (16, 32, 36, 64, 128):
    tbl = jnp.asarray(rng.integers(0, 2**32, size=(N, W), dtype=np.uint32))
    def mk(k):
        def f(t, i):
            acc = jnp.uint32(0)
            for j in range(k):
                acc = acc + jnp.take(t, i ^ j, axis=0)[0, 0]
            return acc
        return jax.jit(f)
    s = slope(mk, tbl, idx)
    print(f"take W={W:3d} ({W*4:4d}B rows): {s*1e3:7.2f} ms ({s/N*1e9:5.1f} ns/row)", flush=True)

# r3-style fused (take -> slice 31 cols + flag OR + concat), W=64
tbl = jnp.asarray(rng.integers(0, 2**32, size=(N, 64), dtype=np.uint32))
vals = idx.astype(jnp.uint32)
def mk_cur(k):
    def f(t, v):
        acc = jnp.uint32(0)
        for j in range(k):
            i = ((v ^ j) & jnp.uint32(0xFFFFF)).astype(jnp.int32)
            g = jnp.take(t, i, axis=0)
            sign = (v >> 31).astype(jnp.uint32)
            flagged = g[:, 31] | (sign << 17)
            out = jnp.concatenate([g[:, :31], flagged[:, None]], axis=1)
            acc = acc + out[0, 0]
        return acc
    return jax.jit(f)
s = slope(mk_cur, tbl, vals)
print(f"r3 fused take (slice+concat): {s*1e3:7.2f} ms ({s/N*1e9:5.1f} ns/row)", flush=True)

# transpose+flag-inject fusion (32-col rows): [n8,32]->[nb,256] with OR
nb = N // 8
def mk_tr(k):
    def f(g, v):
        acc = jnp.uint32(0)
        for j in range(k):
            sgn = ((v >> 31) << 17).astype(jnp.uint32).reshape(N, 1)
            gg = (g ^ j).at[:, 31:32].add(sgn)
            sr = gg.reshape(nb, 8, 32).transpose(0, 2, 1).reshape(nb, 256)
            acc = acc + sr[0, 0]
        return acc
    return jax.jit(f)
g32 = jnp.asarray(rng.integers(0, 2**16, size=(N, 32), dtype=np.uint32))
s = slope(mk_tr, g32, vals)
print(f"transpose+flag [n,32]->[nb,256]: {s*1e3:7.2f} ms", flush=True)
