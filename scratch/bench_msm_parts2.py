#!/usr/bin/env python3
"""Stage breakdown of the round-4 unsigned/packed MSM at 2^20 (slope-timed).

Stages mirror tpu/msm.py's fused program exactly, peeled one at a time:
  digits+sort -> lane_layout x21 -> phase_a x21 -> +phase_b -> +sweep ->
  +reduce -> full msm_vec
"""
import os, sys, time
repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, repo)
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", os.path.join(repo, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import random
from functools import partial
from plonkit_tpu.tpu import mont, msm as M
from plonkit_tpu.tpu.mont import FR

N = 1 << 20
C = 12
W = -(-254 // C)
LANES = 1 << C

@jax.jit
def probe(r):
    leaves = jax.tree_util.tree_leaves(r)
    return sum(l.ravel()[0].astype(jnp.uint32) for l in leaves)

def slope(name, fn, args, k1=1, k2=3):
    r = fn(*args); _ = jax.device_get(probe(r))
    def run(k):
        t0 = time.time()
        for _ in range(k):
            r = fn(*args)
        _ = jax.device_get(probe(r))
        return time.time() - t0
    run(1); t1, t2 = run(k1), run(k2)
    per = (t2 - t1) / (k2 - k1)
    print(f"{name}: {per*1e3:9.2f} ms", flush=True)
    return per

def main():
    print(f"devices: {jax.devices()}", flush=True)
    rng = random.Random(5678)
    from plonkit_tpu.fields import FR_MODULUS as R
    scalars = [rng.randrange(R) for _ in range(N)]
    v_mont = jax.jit(lambda raw: mont.to_mont(FR, raw))(
        jnp.asarray(FR.to_limbs_np(scalars)))
    # synthetic packed table (contents don't matter for timing)
    nprng = np.random.default_rng(0)
    tbl = jnp.asarray(nprng.integers(0, 2**32, size=(N, 16), dtype=np.uint32))
    tbl = tbl.at[:, 15].set(tbl[:, 15] & 0x3FFFFFFF)

    uni = dict(repl=1, r_max=352)
    top = dict(repl=1024, r_max=440)

    def digits_sort(v):
        raw = mont.from_mont(mont.FR, v)
        packed = M._digits_packed(raw, C, W)
        return jax.lax.sort(packed, dimension=1)
    f0 = jax.jit(digits_sort)
    slope("digits+sort [22]", f0, (v_mont,))
    srt = f0(v_mont)

    def layouts(srt):
        outs = []
        for w in range(W - 1):
            keys = (srt[w] >> M.IDX_BITS).astype(jnp.int32)
            outs.append(M._lane_layout(keys, n=N, lanes=LANES, repl=1))
        return outs
    slope("lane_layout x21", jax.jit(layouts), (srt,))

    def pa_all(tbl, srt):
        return [M._phase_a(tbl, srt[w]) for w in range(W - 1)]
    slope("phase_a x21", jax.jit(pa_all), (tbl, srt))

    def buckets_scan(tbl, srt, with_reduce):
        fn = partial(M._window_buckets, n=N, lanes=LANES,
                     r_max=uni["r_max"], repl=1, use_pallas=True)
        bxs, bys, bzs, bads, ovfs = jax.lax.map(
            lambda s: fn(tbl, s), srt[:W - 1])
        if not with_reduce:
            return bxs, bys, bzs
        cat = lambda a: jnp.transpose(a, (1, 0, 2)).reshape(16, (W - 1) * LANES)
        totals, badcat = M._reduce_weighted(
            (cat(bxs), cat(bys), cat(bzs)),
            jnp.transpose(bads, (1, 0, 2)).reshape(1, (W - 1) * LANES),
            lanes=LANES, repl=1, fold=M._get_fold(True, False))
        return totals
    slope("uniform windows (a+b+sweep) x21", jax.jit(partial(buckets_scan, with_reduce=False)), (tbl, srt))
    slope("uniform + batched reduce", jax.jit(partial(buckets_scan, with_reduce=True)), (tbl, srt))

    def top_win(tbl, srt):
        return M._window_from_sorted(tbl, srt[W - 1], n=N, lanes=LANES,
                                     r_max=top["r_max"], repl=top["repl"],
                                     use_pallas=True)
    slope("top window", jax.jit(top_win), (tbl, srt))

    def full(tbl, v):
        raw = mont.from_mont(mont.FR, v)
        packed = M._digits_packed(raw, C, W)
        return M._msm_from_packed(tbl, packed, n=N, lanes=LANES, c=C, W=W,
                                  uni=uni, top=top, use_pallas=True)
    slope("full msm (fused)", jax.jit(full), (tbl, v_mont))

if __name__ == "__main__":
    main()
