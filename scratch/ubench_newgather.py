#!/usr/bin/env python3
"""Measure the restructured per-window MSM gather pipeline at n=2^20:

  a. pure 256B-row take of [n8, 64] u32 (no fused concat/flag)
  b. block pre-transpose [nb,8,64] -> [nb,64,8] ([nb,512])
  c. phase-b aligned 2KB block take (rb*lanes rows)
  d. sign-block take (rb*lanes u32 rows from [nb] packed sign words)

vs the current phase_a (concat+flag fused -> 144B-row take).
"""
import os, sys, time
repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, repo)
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", os.path.join(repo, ".jax_cache"))

N = 1 << 20
LANES = 4096
RMAX = 352          # r_max_eff for c=13 at 2^20
ROW_W = 64

def sync(x):
    leaves = jax.tree_util.tree_leaves(x)
    jax.device_get([l.ravel()[0] for l in leaves])

def timeit(fn, *args, reps=5):
    r = fn(*args); sync(r)
    t0 = time.time()
    for _ in range(reps):
        r = fn(*args)
        sync(r)
    return (time.time() - t0) / reps

def main():
    print(f"devices: {jax.devices()}", flush=True)
    rng = np.random.default_rng(0)
    n8 = N
    tbl = jnp.asarray(rng.integers(0, 2**32, size=(n8, ROW_W), dtype=np.uint32))
    idx = jnp.asarray(rng.permutation(n8).astype(np.int32))
    vals = idx.astype(jnp.uint32) | (jnp.asarray(rng.integers(0, 2, size=n8, dtype=np.uint32)) << 31)
    nb = n8 // 8
    rb = RMAX // 8
    bstart = jnp.asarray(np.sort(rng.integers(0, nb - rb, size=LANES)).astype(np.int32))

    # (a) pure take
    f_take = jax.jit(lambda t, i: jnp.take(t, i, axis=0))
    dt = timeit(f_take, tbl, idx)
    print(f"a  pure take [n,64] 256B rows : {dt*1e3:7.2f} ms ({dt/N*1e9:5.1f} ns/row)", flush=True)
    sorted_rows = f_take(tbl, idx)

    # (a') current-style: take fused with slice-to-36 + flag OR (what r3 does)
    def cur(t, v):
        i = (v & jnp.uint32(0x7FFFFFFF)).astype(jnp.int32)
        g = jnp.take(t, i, axis=0)
        sign = (v >> 31).astype(jnp.uint32)
        flagged = g[:, 31] | (sign << 17)
        return jnp.concatenate([g[:, :31], flagged[:, None]], axis=1)
    dt = timeit(jax.jit(cur), tbl, vals)
    print(f"a' r3-style fused take        : {dt*1e3:7.2f} ms ({dt/N*1e9:5.1f} ns/row)", flush=True)

    # (b) block pre-transpose to [nb, 512]
    f_tr = jax.jit(lambda s: s.reshape(nb, 8, ROW_W).transpose(0, 2, 1).reshape(nb, ROW_W * 8))
    dt = timeit(f_tr, sorted_rows)
    print(f"b  block transpose [nb,512]   : {dt*1e3:7.2f} ms", flush=True)
    sr2 = f_tr(sorted_rows)

    # (b2) fused a+b in one jit (does XLA fuse transpose into gather and slow it?)
    f_ab = jax.jit(lambda t, i: jnp.take(t, i, axis=0).reshape(nb, 8, ROW_W).transpose(0, 2, 1).reshape(nb, ROW_W * 8))
    dt = timeit(f_ab, tbl, idx)
    print(f"ab fused take+transpose       : {dt*1e3:7.2f} ms", flush=True)

    # (c) phase-b 2KB block take
    def phase_b(sr, bs):
        ids = jnp.minimum(bs[None, :] + jax.lax.broadcasted_iota(jnp.int32, (rb, 1), 0), nb - 1).reshape(-1)
        return jnp.take(sr, ids, axis=0)
    f_pb = jax.jit(phase_b)
    dt = timeit(f_pb, sr2, bstart)
    nrows = rb * LANES
    print(f"c  phase-b take 2KB x{nrows//1000}k    : {dt*1e3:7.2f} ms ({dt/nrows*1e9:5.1f} ns/row)", flush=True)

    # (d) sign take: [nb] u32 packed signs gathered to [rb*LANES]
    signs = jnp.asarray(rng.integers(0, 2**32, size=(nb,), dtype=np.uint32))
    def sign_take(s, bs):
        ids = jnp.minimum(bs[None, :] + jax.lax.broadcasted_iota(jnp.int32, (rb, 1), 0), nb - 1).reshape(-1)
        return jnp.take(s, ids, axis=0)
    dt = timeit(jax.jit(sign_take), signs, bstart)
    print(f"d  sign take u32 x{nrows//1000}k       : {dt*1e3:7.2f} ms", flush=True)

    # (e) everything after sort, one jit: a+b+c+d
    def full(t, v, bs):
        i = (v & jnp.uint32(0x7FFFFFFF)).astype(jnp.int32)
        g = jnp.take(t, i, axis=0)
        sr = g.reshape(nb, 8, ROW_W).transpose(0, 2, 1).reshape(nb, ROW_W * 8)
        sgn = (v >> 31).astype(jnp.uint32).reshape(nb, 8)
        sw = jnp.zeros((nb,), jnp.uint32)
        for j in range(8):
            sw = sw | (sgn[:, j] << j)
        ids = jnp.minimum(bs[None, :] + jax.lax.broadcasted_iota(jnp.int32, (rb, 1), 0), nb - 1).reshape(-1)
        return jnp.take(sr, ids, axis=0), jnp.take(sw, ids, axis=0)
    dt = timeit(jax.jit(full), tbl, vals, bstart)
    print(f"e  full window pipeline       : {dt*1e3:7.2f} ms  (x19 = {dt*19e3:6.0f} ms)", flush=True)

if __name__ == "__main__":
    main()
