#!/usr/bin/env python3
"""Is dynamic gather along the sublane axis supported in Pallas TPU kernels?"""
import os, sys, time
repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, repo)
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
jax.config.update("jax_compilation_cache_dir", os.path.join(repo, ".jax_cache"))

R = int(os.environ.get("UB_R", "1024"))
C = int(os.environ.get("UB_C", "128"))
NBLK = int(os.environ.get("UB_NBLK", "512"))

def kernel_taa(x_ref, idx_ref, out_ref):
    out_ref[...] = jnp.take_along_axis(x_ref[...], idx_ref[...], axis=0)

def kernel_lanegather(x_ref, idx_ref, out_ref):
    # gather along the LANE axis instead: x [8, C2] gathered by idx per lane?
    out_ref[...] = jnp.take_along_axis(x_ref[...], idx_ref[...], axis=1)

def build(kern):
    return jax.jit(pl.pallas_call(
        kern,
        grid=(NBLK,),
        in_specs=[pl.BlockSpec((R, C), lambda i: (i, 0)),
                  pl.BlockSpec((R, C), lambda i: (i, 0))],
        out_specs=pl.BlockSpec((R, C), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((NBLK * R, C), jnp.uint32),
    ))

def main():
    print(f"devices: {jax.devices()} R={R} C={C} NBLK={NBLK}", flush=True)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(0, 2**32, size=(NBLK * R, C), dtype=np.uint32))
    idx_np = rng.integers(0, R, size=(NBLK, R)).astype(np.int32)
    idxm = jnp.asarray(np.broadcast_to(idx_np[:, :, None], (NBLK, R, C)).reshape(NBLK * R, C).copy())
    ref = np.asarray(x).reshape(NBLK, R, C)[0][idx_np[0]]
    for name, kern, ax in [("taa sublane", kernel_taa, 0), ("taa lane", kernel_lanegather, 1)]:
        try:
            fn = build(kern)
            if ax == 1:
                # lane gather: idx within [0, C)
                idxl = jnp.asarray(rng.integers(0, C, size=(NBLK * R, C), dtype=np.int32))
                r = fn(x, idxl); r.block_until_ready()
                ok = bool(np.array_equal(np.asarray(r)[:R], np.take_along_axis(np.asarray(x)[:R], np.asarray(idxl)[:R], axis=1)))
                arg = idxl
            else:
                r = fn(x, idxm); r.block_until_ready()
                ok = bool(np.array_equal(np.asarray(r)[:R], ref))
                arg = idxm
            t0 = time.time()
            for _ in range(5):
                fn(x, arg).block_until_ready()
            dt = (time.time() - t0) / 5
            nrow = NBLK * R
            print(f"{name}: ok={ok} {dt*1e3:7.2f} ms ({dt/nrow*1e9:5.2f} ns/row, {nrow*C*4/dt/1e9:6.1f} GB/s)", flush=True)
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:300]}", flush=True)

if __name__ == "__main__":
    main()
