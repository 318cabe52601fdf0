#!/usr/bin/env python3
"""Slope-timed stage costs (dispatch overhead removed): run each stage k
times inside one jit (dependent via index xor to defeat CSE), fit slope."""
import os, sys, time
repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, repo)
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", os.path.join(repo, ".jax_cache"))

N = 1 << 20
LANES = 4096
RMAX = 352
ROW_W = 64
nb = N // 8
rb = RMAX // 8

def sync(x):
    leaves = jax.tree_util.tree_leaves(x)
    jax.device_get([l.ravel()[0] for l in leaves])

def t_of(fn, *args, reps=3):
    r = fn(*args); sync(r)
    t0 = time.time()
    for _ in range(reps):
        sync(fn(*args))
    return (time.time() - t0) / reps

def slope(make, *args):
    f1, f4 = make(1), make(4)
    t1, t4 = t_of(f1, *args), t_of(f4, *args)
    return (t4 - t1) / 3, t1

def main():
    print(f"devices: {jax.devices()}", flush=True)
    rng = np.random.default_rng(0)
    tbl = jnp.asarray(rng.integers(0, 2**32, size=(N, ROW_W), dtype=np.uint32))
    idx = jnp.asarray(rng.permutation(N).astype(np.int32))
    bstart = jnp.asarray(np.sort(rng.integers(0, nb - rb, size=LANES)).astype(np.int32))

    # baseline dispatch overhead
    f0 = jax.jit(lambda i: i + 1)
    print(f"dispatch overhead      : {t_of(f0, idx)*1e3:7.2f} ms", flush=True)

    def mk_take(k):
        def f(t, i):
            acc = jnp.uint32(0)
            for j in range(k):
                g = jnp.take(t, i ^ j, axis=0)
                acc = acc + g[0, 0]
            return acc
        return jax.jit(f)
    s, t1 = slope(mk_take, tbl, idx)
    print(f"take [1M,64] 256B rows : {s*1e3:7.2f} ms/op ({s/N*1e9:5.1f} ns/row)  [1-shot {t1*1e3:.1f}]", flush=True)

    def mk_tr(k):
        def f(t, i):
            acc = jnp.uint32(0)
            for j in range(k):
                g = (t.reshape(nb, 8, ROW_W) ^ j).transpose(0, 2, 1).reshape(nb, ROW_W * 8)
                acc = acc + g[0, 0]
            return acc
        return jax.jit(f)
    s, t1 = slope(mk_tr, tbl, idx)
    print(f"block transpose        : {s*1e3:7.2f} ms/op  [1-shot {t1*1e3:.1f}]", flush=True)

    sr2 = jnp.asarray(rng.integers(0, 2**32, size=(nb, ROW_W * 8), dtype=np.uint32))
    ids = jnp.minimum(bstart[None, :] + jax.lax.broadcasted_iota(jnp.int32, (rb, 1), 0), nb - 1).reshape(-1)
    def mk_pb(k):
        def f(t, i):
            acc = jnp.uint32(0)
            for j in range(k):
                g = jnp.take(t, i ^ j, axis=0)
                acc = acc + g[0, 0]
            return acc
        return jax.jit(f)
    s, t1 = slope(mk_pb, sr2, ids)
    nrows = rb * LANES
    print(f"phase-b take 2KB x{nrows//1000}k : {s*1e3:7.2f} ms/op ({s/nrows*1e9:5.1f} ns/row)  [1-shot {t1*1e3:.1f}]", flush=True)

    # full-window pipeline (sortless part) slope
    vals = idx.astype(jnp.uint32)
    def mk_full(k):
        def f(t, v, bs):
            accs = []
            for j in range(k):
                i = (v ^ j).astype(jnp.int32) & 0xFFFFF
                g = jnp.take(t, i, axis=0)
                sr = g.reshape(nb, 8, ROW_W).transpose(0, 2, 1).reshape(nb, ROW_W * 8)
                idsj = jnp.minimum((bs ^ (j & 1))[None, :] % (nb - rb)
                                   + jax.lax.broadcasted_iota(jnp.int32, (rb, 1), 0), nb - 1).reshape(-1)
                accs.append(jnp.take(sr, idsj, axis=0)[0, 0])
            return sum(accs)
        return jax.jit(f)
    s, t1 = slope(mk_full, tbl, vals, bstart)
    print(f"full window (a+b+c)    : {s*1e3:7.2f} ms/op (x19 = {s*19e3:6.0f} ms)  [1-shot {t1*1e3:.1f}]", flush=True)

    # batched sort cost re-measure (19 windows)
    keys = jnp.asarray(rng.integers(0, 4096, size=(19, N), dtype=np.int32))
    payload = jnp.broadcast_to(vals[None], (19, N))
    def mk_sort(k):
        def f(kk, vv):
            acc = jnp.uint32(0)
            for j in range(k):
                ks, vs = jax.lax.sort_key_val(kk ^ j, vv, dimension=1)
                acc = acc + vs[0, 0] + ks[0, 0].astype(jnp.uint32)
            return acc
        return jax.jit(f)
    s, t1 = slope(mk_sort, keys, payload)
    print(f"batched sort [19,1M]   : {s*1e3:7.2f} ms/op  [1-shot {t1*1e3:.1f}]", flush=True)

if __name__ == "__main__":
    main()
