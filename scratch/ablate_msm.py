#!/usr/bin/env python3
"""In-program ablation of the real MSM pipeline (tpu/msm.py) at 2^20.

Builds jitted prefixes of _msm_from_digits' stages with production shapes
(use_pallas=True) and times each with true device sync, isolating where the
wall-clock goes WITHOUT per-stage dispatch overhead contamination.
"""
import os, sys, time
repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, repo)
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", os.path.join(repo, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from functools import partial
from plonkit_tpu.tpu import msm, msm_pallas, ec, mont
from plonkit_tpu.fields import FR_MODULUS

N = 1 << 20
C = 13

def sync(x):
    jax.device_get([l.ravel()[0] for l in jax.tree_util.tree_leaves(x)])

def t_of(fn, *args, reps=3, label=""):
    t0 = time.time(); r = fn(*args); sync(r)
    print(f"  [{label} compile+first {time.time()-t0:6.1f}s]", flush=True)
    t0 = time.time()
    for _ in range(reps):
        sync(fn(*args))
    dt = (time.time() - t0) / reps
    print(f"{label:28s}: {dt*1e3:8.1f} ms", flush=True)
    return dt

def main():
    rng = np.random.default_rng(7)
    # synthetic curve-free data is fine for timing: random coords
    x = jnp.asarray(rng.integers(0, 2**16, size=(16, N), dtype=np.uint32))
    y = jnp.asarray(rng.integers(0, 2**16, size=(16, N), dtype=np.uint32))
    inf = jnp.zeros((N,), bool)
    scalars_np = rng.integers(0, 2**63, size=N, dtype=np.uint64).astype(object)
    # full-range scalars via numpy chunks
    digits = jnp.asarray(rng.integers(-4096, 4097, size=(20, N), dtype=np.int32))

    ctx_lanes = 4096
    W = 20
    uni = dict(repl=1, r_max=344)
    top = dict(repl=32, r_max=440)
    tbl = jax.jit(msm.build_row_table)(x, y, inf)
    sync(tbl)
    print(f"tbl {tbl.shape}", flush=True)

    keysf = lambda d: jnp.where(inf[None], 0, jnp.abs(d))

    def p_sort(d):
        ks, vs = jax.lax.sort_key_val(keysf(d), msm.sort_payload(d, N), dimension=1)
        return ks[0, 0], vs[0, 0]
    t_of(jax.jit(p_sort), digits, label="digits(sorted)+batched sort")

    def sorted_kv(d):
        return jax.lax.sort_key_val(keysf(d), msm.sort_payload(d, N), dimension=1)
    ks, vs = jax.jit(sorted_kv)(digits)
    sync((ks, vs))

    # lane layout only
    def p_layout(ks):
        outs = jax.lax.map(lambda a: msm._lane_layout(a, n=N, lanes=ctx_lanes, repl=1), ks[:W-1])
        return outs[0][0, 0]
    t_of(jax.jit(p_layout), ks, label="lane_layout x19")

    # phase_a only x19
    def p_pa(tbl, ks, vs):
        def one(a):
            _, v = a
            return msm._phase_a(tbl, v)[0, 0]
        return jnp.sum(jax.lax.map(one, (ks[:W-1], vs[:W-1])))
    t_of(jax.jit(p_pa), tbl, ks, vs, label="phase_a x19")

    # phase_a + transpose + phase_b x19
    def p_pb(tbl, ks, vs):
        def one(a):
            k, v = a
            starts, counts = msm._lane_layout(k, n=N, lanes=ctx_lanes, repl=1)
            bstart = starts // 8
            sr = msm._phase_a(tbl, v)
            data = msm._phase_b_flat(sr, bstart, uni["r_max"] + 8, ctx_lanes, msm.LB)
            return data[0, 0, 0, 0]
        return jnp.sum(jax.lax.map(one, (ks[:W-1], vs[:W-1])))
    t_of(jax.jit(p_pb), tbl, ks, vs, label="ph_a+transpose+ph_b x19")

    # + sweep x19 (production _window_buckets)
    def p_sweep(tbl, ks, vs):
        fn = partial(msm._window_buckets, n=N, lanes=ctx_lanes, r_max=uni["r_max"],
                     repl=1, use_pallas=True)
        bxs, bys, bzs, bads, ovfs = jax.lax.map(lambda a: fn(tbl, *a), (ks[:W-1], vs[:W-1]))
        return bxs[0, 0, 0]
    t_of(jax.jit(p_sweep), tbl, ks, vs, label="+ sweep x19")

    # + reduce (full uniform-window part)
    def p_reduce(tbl, ks, vs):
        fn = partial(msm._window_buckets, n=N, lanes=ctx_lanes, r_max=uni["r_max"],
                     repl=1, use_pallas=True)
        bxs, bys, bzs, bads, ovfs = jax.lax.map(lambda a: fn(tbl, *a), (ks[:W-1], vs[:W-1]))
        cat = lambda a: jnp.transpose(a, (1, 0, 2)).reshape(16, (W - 1) * ctx_lanes)
        totals, badcat = msm._reduce_weighted(
            (cat(bxs), cat(bys), cat(bzs)),
            jnp.transpose(bads, (1, 0, 2)).reshape(1, (W - 1) * ctx_lanes),
            lanes=ctx_lanes, repl=1, fold=msm._get_fold(True, False))
        return totals[0][0, 0]
    t_of(jax.jit(p_reduce), tbl, ks, vs, label="+ reduce")

    # top window alone
    def p_top(tbl, ks, vs):
        r = msm._window_from_sorted(tbl, ks[W-1], vs[W-1], n=N, lanes=ctx_lanes,
                                    r_max=top["r_max"], repl=top["repl"], use_pallas=True)
        return r[0][0, 0]
    t_of(jax.jit(p_top), tbl, ks, vs, label="top window")

    # full production msm
    fullfn = msm._msm_digits_jit(N, ctx_lanes, C, W,
                                 tuple(sorted(uni.items())), tuple(sorted(top.items())), True)
    t_of(lambda t, i, d: fullfn(t, i, d)[0][0], tbl, inf, digits, label="FULL msm (production)")

if __name__ == "__main__":
    main()
