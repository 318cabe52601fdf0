#!/usr/bin/env python3
"""Slope-timed breakdown of the 2^20 MSM: full vs gathers-only vs sweep-only."""
import os, sys, time
repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, repo)
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", os.path.join(repo, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from functools import partial
from plonkit_tpu.tpu import msm as M, msm_pallas, ec, mont
from plonkit_tpu.tpu.mont import FR, FQ, NLIMBS

n = 1 << 20
# synthetic affine bases: random field values as x/y (NOT on curve - fine for timing)
rng = np.random.default_rng(2)
x = jnp.asarray(rng.integers(0, 1 << 16, (16, n), dtype=np.uint32))
y = jnp.asarray(rng.integers(0, 1 << 16, (16, n), dtype=np.uint32))
inf = jnp.zeros((n,), dtype=bool)
ctx_c = 13
ctx = M.MSMContext.from_device_affine(x, y, inf, c=ctx_c)
print(f"lanes={ctx.lanes} W={ctx.num_windows} uni={ctx.uni} top={ctx.top}", flush=True)

scal = jnp.asarray(rng.integers(0, 1 << 16, (16, n), dtype=np.uint32))

@jax.jit
def probe(t):
    leaves = jax.tree_util.tree_leaves(t)
    return sum(l.ravel()[0].astype(jnp.uint32) for l in leaves)

def slope(name, fn, args, k1=1, k2=4):
    r = fn(*args); _ = jax.device_get(probe(r))
    def run(k):
        t0 = time.time()
        for _ in range(k):
            r = fn(*args)
        _ = jax.device_get(probe(r))
        return time.time() - t0
    run(1)
    t1, t2 = run(k1), run(k2)
    print(f"{name}: {(t2-t1)/(k2-k1)*1e3:9.1f} ms", flush=True)

# full msm (one fused dispatch)
full = M._msm_vec_jit(n, n, ctx.lanes, ctx.c, ctx.num_windows,
                      ctx._uni_key, ctx._top_key, ctx._use_pallas)
slope("full msm 2^20 (c=13)", full, (ctx.tbl, ctx.inf, scal))

# pieces: digits+sort / gathers / sweep, uniform windows only
W = ctx.num_windows
uni = dict(ctx._uni_key)

@jax.jit
def digits_sort(tbl, inf_, v):
    raw = mont.from_mont(mont.FR, v)
    digits = M._digits_body(raw, ctx_c, W)
    keys = jnp.where(inf_[None], 0, jnp.abs(digits))
    ks, vs = jax.lax.sort_key_val(keys, M.sort_payload(digits, n), dimension=1)
    return ks, vs

ks, vs = digits_sort(ctx.tbl, ctx.inf, scal)
slope("digits+batched sort", digits_sort, (ctx.tbl, ctx.inf, scal))

@jax.jit
def gathers(tbl, ks, vs):
    def one(a):
        k, v = a
        starts, counts = M._lane_layout(k, n=n, lanes=ctx.lanes, repl=1)
        sr = M._phase_a(tbl, v)
        data = M._phase_b_flat(sr, starts // 8, uni["r_max"] + 8, ctx.lanes, 512)
        return data[0, 0, :8, 0], jnp.stack([starts % 8, counts])
    outs = jax.lax.map(one, (ks[:W-1], vs[:W-1]))
    return outs

slope("gathers x19 (a+b)", gathers, (ctx.tbl, ks, vs))

@jax.jit
def sweeps(tbl, ks, vs):
    def one(a):
        k, v = a
        bx, by, bz, bad, ovf = M._window_buckets(
            tbl, k, v, n=n, lanes=ctx.lanes, r_max=uni["r_max"], repl=1,
            use_pallas=True)
        return bx[:, :8], bad[:, :8]
    return jax.lax.map(one, (ks[:W-1], vs[:W-1]))

slope("gather+sweep x19", sweeps, (ctx.tbl, ks, vs))


@jax.jit
def layout_only(ks):
    def one(k):
        starts, counts = M._lane_layout(k, n=n, lanes=ctx.lanes, repl=1)
        return starts[:8] + counts[:8]
    return jax.lax.map(one, ks[:W-1])

slope("lane_layout x19", layout_only, (ks,))

@jax.jit
def top_only(tbl, ks, vs):
    return M._window_from_sorted(tbl, ks[W-1], vs[W-1], n=n, lanes=ctx.lanes,
                                 r_max=dict(ctx._top_key)["r_max"],
                                 repl=dict(ctx._top_key)["repl"], use_pallas=True)[0]

slope("top window full", top_only, (ctx.tbl, ks, vs))

@jax.jit
def uni_reduce(tbl, ks, vs):
    from functools import partial as _p
    uni_fn = _p(M._window_buckets, n=n, lanes=ctx.lanes, r_max=uni["r_max"], repl=1, use_pallas=True)
    bxs, bys, bzs, bads, ovfs = jax.lax.map(lambda a: uni_fn(tbl, *a), (ks[:W-1], vs[:W-1]))
    cat = lambda a: jnp.transpose(a, (1, 0, 2)).reshape(16, (W - 1) * ctx.lanes)
    totals, badcat = M._reduce_weighted((cat(bxs), cat(bys), cat(bzs)),
        jnp.transpose(bads, (1, 0, 2)).reshape(1, (W - 1) * ctx.lanes),
        lanes=ctx.lanes, repl=1, fold=M._get_fold(True, False))
    return totals[0]

slope("gather+sweep+reduce x19", uni_reduce, (ctx.tbl, ks, vs))
