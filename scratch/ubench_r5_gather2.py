#!/usr/bin/env python3
"""Follow-up: the 2^17-row take ran at 1.58 ns/row vs 6.45 at 2^20 rows.
Find the knob: output size sweep, chunked takes into one output, and
whether a fori_loop of chunked takes with dynamic_update_slice keeps the
fast path."""
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

N = 1 << 20


@jax.jit
def probe(r):
    return r.ravel()[0]


def slope(name, fn, args, rows, k1=2, k2=10):
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
    print(f"{name}: {per*1e3:9.3f} ms  ({per/rows*1e9:6.2f} ns/row)",
          flush=True)


def main():
    print(f"devices: {jax.devices()}", flush=True)
    rng = np.random.default_rng(0)
    tbl = jnp.asarray(rng.integers(0, 2**32, size=(N, 16), dtype=np.uint32))
    f1 = jax.jit(lambda t, i: jnp.take(t, i, axis=0))

    # output-size sweep from the full 2^20 table
    for lg in (15, 16, 17, 18, 19, 20):
        m = 1 << lg
        idx = jnp.asarray(rng.integers(0, N, size=m, dtype=np.int32))
        slope(f"take 2^{lg} rows of 2^20 tbl", f1, (tbl, idx), m)

    # chunked: 8 x 2^17 takes, concatenated (one jit)
    idx_full = jnp.asarray(rng.permutation(N).astype(np.int32))

    @jax.jit
    def chunked(t, i):
        C = 8
        m = N // C
        return jnp.concatenate(
            [jnp.take(t, i[j * m:(j + 1) * m], axis=0) for j in range(C)],
            axis=0)
    slope("8 x 2^17 chunked takes", chunked, (tbl, idx_full), N)

    @jax.jit
    def chunked16(t, i):
        C = 16
        m = N // C
        return jnp.concatenate(
            [jnp.take(t, i[j * m:(j + 1) * m], axis=0) for j in range(C)],
            axis=0)
    slope("16 x 2^16 chunked takes", chunked16, (tbl, idx_full), N)

    @jax.jit
    def chunked_dus(t, i):
        C = 8
        m = N // C
        out = jnp.zeros((N, 16), jnp.uint32)

        def body(j, out):
            part = jnp.take(t, jax.lax.dynamic_slice_in_dim(i, j * m, m),
                            axis=0)
            return jax.lax.dynamic_update_slice_in_dim(out, part, j * m, 0)
        return jax.lax.fori_loop(0, C, body, out)
    slope("fori 8 x 2^17 take+DUS", chunked_dus, (tbl, idx_full), N)

    # does the win survive the fused phase_a transpose shape?
    from plonkit_tpu.tpu import msm as M
    srt = jnp.asarray(((rng.integers(0, 4096, size=N).astype(np.uint32) << 20)
                       | rng.permutation(N).astype(np.uint32)))
    f_pa = jax.jit(M._phase_a)
    slope("phase_a fused (baseline)", f_pa, (tbl, srt), N)

    @jax.jit
    def phase_a_chunked(t, s):
        C = 8
        m = N // C
        idx = (s & jnp.uint32((1 << 20) - 1)).astype(jnp.int32)
        gs = [jnp.take(t, idx[j * m:(j + 1) * m], axis=0) for j in range(C)]
        g = jnp.concatenate(gs, axis=0)
        nb = N // 8
        return g.reshape(nb, 8, 16).transpose(0, 2, 1).reshape(nb, 128)
    slope("phase_a 8-chunk takes", phase_a_chunked, (tbl, srt), N)

    # per-chunk transpose fused with per-chunk take
    @jax.jit
    def phase_a_chunked2(t, s):
        C = 8
        m = N // C
        idx = (s & jnp.uint32((1 << 20) - 1)).astype(jnp.int32)
        outs = []
        for j in range(C):
            g = jnp.take(t, idx[j * m:(j + 1) * m], axis=0)
            nb = m // 8
            outs.append(g.reshape(nb, 8, 16).transpose(0, 2, 1).reshape(nb, 128))
        return jnp.concatenate(outs, axis=0)
    slope("phase_a 8-chunk take+T", phase_a_chunked2, (tbl, srt), N)


if __name__ == "__main__":
    main()
