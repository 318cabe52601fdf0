#!/usr/bin/env python3
"""Can a Pallas manual-DMA gather beat XLA's take (~32 ns/row @ 256 B)?

Kernel: grid over index blocks; per step a [B]-int32 SMEM block of row ids,
issue B async copies HBM row -> VMEM output block, then wait them all.
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", os.path.join(repo, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

N = 1 << 20
G = 1 << 20
# Mosaic DMA slices must be 128-lane aligned, so the kernel fetches 512 B
# PAIR rows (two 256 B point rows; the consumer selects the half by idx&1)
ROW = 128                     # u32 per DMA row (512 B)
B = int(os.environ.get("UB_B", "2048"))


def kernel(tbl_ref, idx_ref, out_ref, sem):
    def issue(j, _):
        src = tbl_ref.at[pl.ds(idx_ref[j], 1), :]
        dst = out_ref.at[pl.ds(j, 1), :]
        pltpu.make_async_copy(src, dst, sem).start()
        return 0

    jax.lax.fori_loop(0, B, issue, 0)

    def drain(j, _):
        src = tbl_ref.at[pl.ds(idx_ref[j], 1), :]
        dst = out_ref.at[pl.ds(j, 1), :]
        pltpu.make_async_copy(src, dst, sem).wait()
        return 0

    jax.lax.fori_loop(0, B, drain, 0)


def make_fn():
    return jax.jit(pl.pallas_call(
        kernel,
        grid=(G // B,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((B,), lambda i: (i,), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((B, ROW), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((G, ROW), jnp.uint32),
        scratch_shapes=[pltpu.SemaphoreType.DMA],
    ))


def sync(r):
    jax.device_get(r[0, 0])


def main():
    print(f"devices: {jax.devices()}  G={G} B={B}", flush=True)
    rng = np.random.default_rng(0)
    tbl = jnp.asarray(rng.integers(0, 2**32, size=(N // 2, ROW),
                                   dtype=np.uint32))
    idx = jnp.asarray(rng.integers(0, N // 2, size=(G,), dtype=np.int32))

    ref_fn = jax.jit(lambda t, i: jnp.take(t, i, axis=0))
    r0 = ref_fn(tbl, idx)
    sync(r0)
    t0 = time.time()
    for _ in range(3):
        sync(ref_fn(tbl, idx))
    dt = (time.time() - t0) / 3
    print(f"xla take : {dt*1e3:8.1f} ms ({dt/G*1e9:5.1f} ns/row, "
          f"{G*ROW*4/dt/1e9:5.1f} GB/s)", flush=True)

    fn = make_fn()
    r = fn(tbl, idx)
    sync(r)
    ok = bool(jnp.array_equal(r[:4096], r0[:4096]))
    print(f"dma gather correct: {ok}", flush=True)
    assert ok
    t0 = time.time()
    for _ in range(3):
        sync(fn(tbl, idx))
    dt = (time.time() - t0) / 3
    print(f"dma gather: {dt*1e3:8.1f} ms ({dt/G*1e9:5.1f} ns/row, "
          f"{G*ROW*4/dt/1e9:5.1f} GB/s)", flush=True)


if __name__ == "__main__":
    main()
