#!/usr/bin/env python3
"""Round-5 gather experiments: is phase_a issue-bound, bank-limited, or
table-size-limited?  Decides whether a chunked VMEM-resident-table MSM or
a batched all-window take is worth building.

  a) per-window take (baseline, [2^20, 16] table)   ~6.4 ns/row expected
  b) ONE take for all 22 windows ([22*2^20] indices)
  c) take from a small (2^17 rows = 8 MB, VMEM-size) table, random idx
  d) take with all-identical indices (bank-conflict probe)
  e) take from 2^17 table with 2^20 random idx (chunked-MSM access shape)
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
W = 22


@jax.jit
def probe(r):
    return r.ravel()[0]


def slope(name, fn, args, rows, k1=2, k2=6):
    r = fn(*args)
    jax.device_get(probe(r))

    def run(k):
        t0 = time.time()
        for _ in range(k):
            r = fn(*args)
        jax.device_get(probe(r))
        return time.time() - t0

    run(1)
    t1, t2 = run(k1), run(k2)
    per = (t2 - t1) / (k2 - k1)
    print(f"{name}: {per*1e3:9.2f} ms  ({per/rows*1e9:6.2f} ns/row)",
          flush=True)


def main():
    print(f"devices: {jax.devices()}", flush=True)
    rng = np.random.default_rng(0)
    tbl = jnp.asarray(rng.integers(0, 2**32, size=(N, 16), dtype=np.uint32))
    idx1 = jnp.asarray(rng.permutation(N).astype(np.int32))
    idxW = jnp.asarray(
        np.stack([rng.permutation(N) for _ in range(W)]).astype(np.int32))

    f1 = jax.jit(lambda t, i: jnp.take(t, i, axis=0))
    slope("a) 1-window take 2^20x64B", f1, (tbl, idx1), N)

    fW = jax.jit(lambda t, i: jnp.take(t, i.reshape(-1), axis=0))
    slope("b) 22-window one take", fW, (tbl, idxW), W * N)

    fmapW = jax.jit(lambda t, i: jax.lax.map(
        lambda ix: jnp.take(t, ix, axis=0), i))
    slope("b2) 22-window lax.map take", fmapW, (tbl, idxW), W * N)

    NS = 1 << 17
    tbl_s = tbl[:NS]
    idx_s = jnp.asarray(rng.integers(0, NS, size=NS, dtype=np.int32))
    slope("c) small-table take 2^17x64B", f1, (tbl_s, idx_s), NS)

    idx_same = jnp.zeros((N,), jnp.int32)
    slope("d) identical-idx take 2^20", f1, (tbl, idx_same), N)

    idx_big = jnp.asarray(rng.integers(0, NS, size=N, dtype=np.int32))
    slope("e) 2^17 table, 2^20 idx", f1, (tbl, idx_big), N)

    # f) sorted (monotone) indices — best-case locality
    idx_sorted = jnp.asarray(np.sort(rng.integers(0, N, size=N)).astype(np.int32))
    slope("f) sorted-idx take 2^20", f1, (tbl, idx_sorted), N)

    # g) 32B rows (split x/y tables): 2 takes of 8 words
    tbl32 = tbl[:, :8]
    f32 = jax.jit(lambda t, i: (jnp.take(t, i, axis=0),
                                jnp.take(t, i, axis=0)))
    slope("g) 2x 32B-row takes", f32, (tbl32, idx1), N)

    # h) 128B rows (two points per row): half the rows
    tbl128 = jnp.concatenate([tbl[:N // 2], tbl[N // 2:]], axis=1)
    idx_h = jnp.asarray(rng.permutation(N // 2).astype(np.int32))
    fh = jax.jit(lambda t, i: jnp.take(t, i, axis=0))
    slope("h) 128B-row take 2^19", fh, (tbl128, idx_h), N // 2)


if __name__ == "__main__":
    main()
