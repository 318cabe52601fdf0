#!/usr/bin/env python3
"""Stage-level timing breakdown of the 2^20 MSM (uses the bench base cache).

Times, each jitted separately on the real TPU:
  - digit decomposition (from Montgomery limbs)
  - batched all-window sort (keys + index|sign payload)
  - one uniform window: phase-a scattered row gather (+ sign fold)
  - one uniform window: phase-b aligned block gather + transpose
  - pallas sweep kernel alone
  - one full uniform window (gathers + sweep + reduction)
  - full fused msm_vec (the headline path)
"""

import os
import sys
import time
from functools import partial

repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, repo)

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", os.path.join(repo, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import random

from plonkit_tpu.fields import FR_MODULUS as R
from plonkit_tpu.tpu import mont, msm as M
from plonkit_tpu.tpu.mont import FR, NLIMBS
from plonkit_tpu.tpu.msm import MSMContext

LOG2 = int(os.environ.get("BENCH_MSM_LOG2", "20"))
n = 1 << LOG2

_cache = os.path.join(repo, ".bench_cache", f"bases_{LOG2}.npz")
if not os.path.exists(_cache):
    _cache = os.path.join(repo, ".bench_cache", f"bases_{LOG2}_s1234_v1.npz")
if not os.path.exists(_cache):
    sys.exit(f"no base cache for 2^{LOG2}; run `python bench.py` once "
             f"(BENCH_MSM_LOG2={LOG2}) to generate it")
blob = np.load(_cache)
x = jnp.asarray(blob["x"]); y = jnp.asarray(blob["y"]); inf = jnp.asarray(blob["inf"])
ctx = MSMContext.from_device_affine(x, y, inf, c=13)
print(f"n=2^{LOG2} lanes={ctx.lanes} W={ctx.num_windows} uni={ctx.uni} top={ctx.top}",
      file=sys.stderr)

rng = random.Random(1234)
scalars = [rng.randrange(R) for _ in range(n)]
v_mont = jax.jit(lambda raw: mont.to_mont(FR, raw))(jnp.asarray(FR.to_limbs_np(scalars)))
v_mont.block_until_ready()

W = ctx.num_windows
c = ctx.c
tbl = ctx.tbl


def _block(r):
    # under the axon remote-TPU tunnel block_until_ready returns before the
    # computation finishes; a device_get of one element is a true sync
    leaves = [a for a in jax.tree_util.tree_leaves(r) if hasattr(a, "ndim")]
    for a in leaves:
        jax.device_get(a[(0,) * a.ndim] if a.ndim else a)


def timeit(name, fn, *args, reps=3):
    r = fn(*args)
    _block(r)
    t0 = time.time()
    for _ in range(reps):
        r = fn(*args)
        _block(r)
    dt = (time.time() - t0) / reps
    print(f"{name:28s} {dt*1000:9.1f} ms", file=sys.stderr, flush=True)
    return r


# 1. digits
@jax.jit
def digits_fn(v):
    raw = mont.from_mont(FR, v)
    return M._digits_body(raw, c, W)

digits = timeit("digits", digits_fn, v_mont)

# 2. batched sort (keys + payload)
@jax.jit
def sort_fn(digits, inf):
    keys = jnp.where(inf[None], 0, jnp.abs(digits))
    return jax.lax.sort_key_val(keys, M.sort_payload(digits, n), dimension=1)

keys_sorted, vals_sorted = timeit("batched sort [W,n]", sort_fn, digits, inf)

# 3. one uniform window: phase-a scattered gather + sign fold
uni = ctx.uni
r_max_eff = uni["r_max"] + 8

@jax.jit
def pa_fn(tbl, vs):
    return M._phase_a(tbl, vs)

sorted_rows = timeit("phase-a row gather", pa_fn, tbl, vals_sorted[0])

# 4. phase-b block gather + transpose
@jax.jit
def pb_fn(tbl_sorted, ks):
    starts, counts = M._lane_layout(ks, n=n, lanes=ctx.lanes, repl=1)
    data = M._phase_b(tbl_sorted, starts // 8, r_max_eff, ctx.lanes)
    return data, jnp.stack([starts % 8, counts])

data, meta = timeit("phase-b block gather", pb_fn, sorted_rows, keys_sorted[0])

# 5. sweep kernel only (pallas)
from plonkit_tpu.tpu import msm_pallas
sweep_fn = jax.jit(lambda d, m: msm_pallas.sweep(d, m))
timeit("pallas sweep", sweep_fn, data, meta)

# 6. one full uniform window
win_fn = jax.jit(partial(M._window_from_sorted, n=n, lanes=ctx.lanes,
                         r_max=uni["r_max"], repl=1,
                         num_buckets=uni["num_buckets"], use_pallas=True))
timeit("window full", win_fn, tbl, keys_sorted[0], vals_sorted[0])

# 7. full fused msm
def full(v):
    return ctx.msm_vec(v)

r = timeit("full msm_vec (host sync)", full, v_mont, reps=3)
print("result ok", file=sys.stderr)
