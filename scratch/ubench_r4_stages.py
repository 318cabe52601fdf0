#!/usr/bin/env python3
"""Clean single-window stage timing for the round-4 MSM (slope k1=3,k2=9):
phase_a alone, phase_b alone, sweep alone, a+b+sweep chained, reduce."""
import os, sys, time
repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, repo)
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", os.path.join(repo, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from functools import partial
from plonkit_tpu.tpu import msm as M, msm_pallas

N = 1 << 20
C = 12
LANES = 1 << C
RMAX = 352
RME = RMAX + 8
RB = RME // 8
LB = 512
NBLK = LANES // LB

@jax.jit
def probe(r):
    leaves = jax.tree_util.tree_leaves(r)
    return sum(l.ravel()[0].astype(jnp.uint32) for l in leaves)

def slope(name, fn, args, k1=3, k2=9):
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

def main():
    print(f"devices: {jax.devices()}", flush=True)
    rng = np.random.default_rng(0)
    tbl = jnp.asarray(rng.integers(0, 2**32, size=(N, 16), dtype=np.uint32))
    tbl = tbl.at[:, 15].set(tbl[:, 15] & 0x3FFFFFFF)
    # synthetic sorted elements: uniform keys, arbitrary idx
    keys = np.sort(rng.integers(0, 4096, size=N, dtype=np.uint32))
    idx = rng.permutation(N).astype(np.uint32)
    srt = jnp.asarray((keys << 20) | idx)

    f_pa = jax.jit(M._phase_a)
    slope("phase_a (take+blockT)", f_pa, (tbl, srt))
    sr2 = f_pa(tbl, srt)

    starts = jnp.asarray(np.linspace(0, N - RME, LANES).astype(np.int32))
    bstart = starts // 8
    smod = starts % 8
    cnts = jnp.minimum(jnp.full((LANES,), 260, jnp.int32), RME - smod)

    f_pb = jax.jit(partial(M._phase_b_flat, r_max_eff=RME, lanes=LANES, lb=LB))
    slope("phase_b (512B blocks)", f_pb, (sr2, bstart))
    data = f_pb(sr2, bstart)
    meta = jax.jit(partial(M._meta_flat, lanes=LANES, lb=LB))(smod, cnts)

    f_sw = jax.jit(lambda d, m: msm_pallas.sweep_flat(d, m))
    slope("sweep_flat", f_sw, (data, meta))

    def chain(tbl, srt, bstart, meta):
        sr2 = M._phase_a(tbl, srt)
        d = M._phase_b_flat(sr2, bstart, RME, LANES, LB)
        return msm_pallas.sweep_flat(d, meta)
    slope("a+b+sweep chained", jax.jit(chain), (tbl, srt, bstart, meta))

    def wb(tbl, srt):
        return M._window_buckets(tbl, srt, n=N, lanes=LANES, r_max=RMAX,
                                 repl=1, use_pallas=True)
    slope("window_buckets (incl layout)", jax.jit(wb), (tbl, srt))

    bx, by, bz, bad, _ = wb(tbl, srt)
    catx = jnp.tile(bx, (1, 21)); caty = jnp.tile(by, (1, 21))
    catz = jnp.tile(bz, (1, 21)); catb = jnp.tile(bad, (1, 21))
    f_red = jax.jit(lambda a, b, c, d: M._reduce_weighted(
        (a, b, c), d, lanes=LANES, repl=1, fold=M._get_fold(True, False)))
    slope("reduce x21 batched", f_red, (catx, caty, catz, catb))

if __name__ == "__main__":
    main()
