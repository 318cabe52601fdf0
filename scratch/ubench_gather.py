#!/usr/bin/env python3
"""Microbenchmark: XLA gather layouts on TPU for the MSM padded gather.

Variants gathering G = r_max*lanes elements from n = 2^20 points:
  col    jnp.take(x[16, n], idx, axis=1) twice (x and y)    [current]
  row    jnp.take(pts[n, 32], idx, axis=0) + transpose      [proposed]
  row16  jnp.take(x[n, 16], idx, axis=0) twice + transpose
"""

import os
import sys
import time

repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, repo)

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", os.path.join(repo, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

N = 1 << 20
R_MAX, LANES = 344, 4224
G = R_MAX * LANES

rng = np.random.default_rng(0)
x = jnp.asarray(rng.integers(0, 2**32, size=(16, N), dtype=np.uint32))
y = jnp.asarray(rng.integers(0, 2**32, size=(16, N), dtype=np.uint32))
xr = jnp.asarray(np.ascontiguousarray(np.asarray(x).T))          # [N, 16]
yr = jnp.asarray(np.ascontiguousarray(np.asarray(y).T))
pts = jnp.concatenate([xr, yr], axis=1)                           # [N, 32]
idx = jnp.asarray(rng.integers(0, N, size=(G,), dtype=np.int32))


def sync(r):
    jax.device_get(jax.tree_util.tree_leaves(r)[0].ravel()[0])


def timeit(name, fn, *args, reps=3):
    r = fn(*args)
    sync(r)
    t0 = time.time()
    for _ in range(reps):
        r = fn(*args)
        sync(r)
    dt = (time.time() - t0) / reps
    gb = G * 32 * 4 / 1e9
    print(f"{name:8s} {dt*1e3:8.1f} ms  ({gb/dt:6.1f} GB/s)", flush=True)


@jax.jit
def g_col(x, y, idx):
    return (jnp.take(x, idx, axis=1).reshape(16, R_MAX, LANES),
            jnp.take(y, idx, axis=1).reshape(16, R_MAX, LANES))


@jax.jit
def g_row(pts, idx):
    g = jnp.take(pts, idx, axis=0)                    # [G, 32]
    g = g.reshape(R_MAX, LANES, 32)
    return jnp.transpose(g, (2, 0, 1))                # [32, r, lanes]


@jax.jit
def g_row16(xr, yr, idx):
    gx = jnp.transpose(jnp.take(xr, idx, axis=0).reshape(R_MAX, LANES, 16), (2, 0, 1))
    gy = jnp.transpose(jnp.take(yr, idx, axis=0).reshape(R_MAX, LANES, 16), (2, 0, 1))
    return gx, gy


def width_test(row_u32: int):
    """Gather G rows of `row_u32` u32 each from a [N_rows, row_u32] table:
    tests whether the gather is descriptor-latency-bound (time ~ rows) or
    bandwidth-bound (time ~ bytes)."""
    n_rows = max(1, (1 << 25) // row_u32)           # 128 MiB table
    tbl = jnp.asarray(rng.integers(0, 2**32, size=(n_rows, row_u32),
                                   dtype=np.uint32))
    ridx = jnp.asarray(rng.integers(0, n_rows, size=(G,), dtype=np.int32))
    f = jax.jit(lambda t, i: jnp.take(t, i, axis=0))
    r = f(tbl, ridx)
    sync(r)
    t0 = time.time()
    reps = 3
    for _ in range(reps):
        sync(f(tbl, ridx))
    dt = (time.time() - t0) / reps
    gb = G * row_u32 * 4 / 1e9
    print(f"width {row_u32*4:5d}B {dt*1e3:8.1f} ms  ({gb/dt:6.1f} GB/s, "
          f"{dt/G*1e9:5.1f} ns/row)", flush=True)


def slice_test(rows_per_slice: int):
    """Contiguous-slice gather: LANES starts, each pulling
    [rows_per_slice, 32] contiguous rows (vmap of dynamic_slice)."""
    starts = jnp.asarray(
        np.sort(rng.integers(0, N - rows_per_slice, size=(LANES,), dtype=np.int32)))

    def one(s):
        return jax.lax.dynamic_slice(pts, (s, 0), (rows_per_slice, 32))

    f = jax.jit(lambda ss: jax.vmap(one)(ss))
    r = f(starts)
    sync(r)
    t0 = time.time()
    reps = 3
    for _ in range(reps):
        sync(f(starts))
    dt = (time.time() - t0) / reps
    gb = LANES * rows_per_slice * 32 * 4 / 1e9
    print(f"slices r={rows_per_slice:4d} {dt*1e3:8.1f} ms  ({gb/dt:6.1f} GB/s)",
          flush=True)


if __name__ == "__main__":
    print(f"devices: {jax.devices()}  G={G}", flush=True)
    mode = os.environ.get("UB_MODE", "base")
    if mode == "base":
        timeit("col", g_col, x, y, idx)
        timeit("row", g_row, pts, idx)
        timeit("row16", g_row16, xr, yr, idx)
    elif mode == "width":
        for w in (8, 32, 64, 128, 256):
            width_test(w)
    elif mode == "slice":
        for rp in (8, 64, 344):
            slice_test(rp)
