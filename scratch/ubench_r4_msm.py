#!/usr/bin/env python3
"""Round-4 MSM redesign ubench: packed u16 table + unsigned c=12 digits +
single-u32 sort (key<<20 | idx).

Measures, at n=2^20 on the real chip:
  1. single-operand batched sort [W, n] u32  (vs 2-operand key+val sort)
  2. unsigned digit extraction (no carry chain)
  3. phase-a take of 64B rows ([n,16] u32 packed x|y)
  4. pre-transpose + phase-b aligned block take at packed width (512B rows)
  5. the current pipeline's digits+sort for comparison
"""
import os, sys, time
repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, repo)
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", os.path.join(repo, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

N = 1 << 20
C = 12
W = -(-256 // C)          # 22 unsigned windows covers 264 bits
LANES = 2048
RMAX = 656                # mean 512 + 5*sqrt + 8, 8-aligned, +8 slop


def sync(x):
    leaves = jax.tree_util.tree_leaves(x)
    jax.device_get([l.ravel()[0] for l in leaves])


def timeit(fn, *args, reps=5):
    r = fn(*args); sync(r)
    t0 = time.time()
    for _ in range(reps):
        sync(fn(*args))
    return (time.time() - t0) / reps


def main():
    print(f"devices: {jax.devices()}", flush=True)
    rng = np.random.default_rng(0)

    # ---- 1. sorts ----
    keyvals = jnp.asarray(rng.integers(0, 2**32, size=(W, N), dtype=np.uint32))
    f_sort1 = jax.jit(lambda kv: jax.lax.sort(kv, dimension=1))
    t = timeit(f_sort1, keyvals)
    print(f"sort single-u32 [{W},{N}]: {t*1e3:8.2f} ms", flush=True)

    keys = jnp.asarray(rng.integers(0, 4096, size=(W, N), dtype=np.uint32))
    vals = jnp.asarray(rng.integers(0, 2**32, size=(W, N), dtype=np.uint32))
    f_sort2 = jax.jit(lambda k, v: jax.lax.sort_key_val(k, v, dimension=1))
    t = timeit(f_sort2, keys, vals)
    print(f"sort key+val  [{W},{N}]: {t*1e3:8.2f} ms", flush=True)

    # ---- 2. unsigned digits from [16, N] canonical 16-bit limbs ----
    raw = jnp.asarray(rng.integers(0, 65536, size=(16, N), dtype=np.uint32))

    def digits_unsigned(raw):
        iota = jax.lax.broadcasted_iota(jnp.uint32, (1, N), 0)
        out = []
        for w in range(W):
            bit0 = w * C
            limb0 = bit0 // 16
            off = bit0 % 16
            val = raw[limb0] >> off
            if off + C > 16 and limb0 + 1 < 16:
                val = val | (raw[limb0 + 1] << (16 - off))
            d = val & ((1 << C) - 1)
            out.append((d << 20) | iota[0])
        return jnp.stack(out)

    f_dig = jax.jit(digits_unsigned)
    t = timeit(f_dig, raw)
    print(f"unsigned digits+pack [{W},{N}]: {t*1e3:8.2f} ms", flush=True)

    def dig_sort(raw):
        return jax.lax.sort(digits_unsigned(raw), dimension=1)
    f_ds = jax.jit(dig_sort)
    t = timeit(f_ds, raw)
    print(f"digits+sort fused: {t*1e3:8.2f} ms", flush=True)

    # ---- 3. phase-a 64B take ----
    tbl = jnp.asarray(rng.integers(0, 2**32, size=(N, 16), dtype=np.uint32))
    idx = jnp.asarray(rng.permutation(N).astype(np.int32))

    f_take = jax.jit(lambda tbl, i: jnp.take(tbl, i, axis=0))
    t = timeit(f_take, tbl, idx)
    print(f"phase-a take 64B rows: {t*1e3:8.2f} ms ({t/N*1e9:5.1f} ns/row)",
          flush=True)

    # take with index computed from sorted u32 (mask fused in)
    srt = f_sort1(keyvals)[0]
    f_take2 = jax.jit(lambda tbl, s: jnp.take(
        tbl, (s & jnp.uint32(0xFFFFF)).astype(jnp.int32), axis=0))
    t = timeit(f_take2, tbl, srt)
    print(f"phase-a take (fused mask): {t*1e3:8.2f} ms", flush=True)

    # ---- 4. pre-transpose + phase-b ----
    def pre_t(sr):
        nb = sr.shape[0] // 8
        return sr.reshape(nb, 8, 16).transpose(0, 2, 1).reshape(nb, 128)
    f_pt = jax.jit(pre_t)
    sr = f_take(tbl, idx)
    t = timeit(f_pt, sr)
    print(f"block pre-transpose: {t*1e3:8.2f} ms", flush=True)

    sr2 = f_pt(sr)
    nb = N // 8
    rb = RMAX // 8
    bstart = jnp.asarray(rng.integers(0, nb - rb, size=(LANES,), dtype=np.int32))
    def phase_b(sr2, bstart):
        ids = jnp.minimum(bstart[None, :]
                          + jax.lax.broadcasted_iota(jnp.int32, (rb, 1), 0),
                          nb - 1).reshape(-1)
        return jnp.take(sr2, ids, axis=0)
    f_pb = jax.jit(phase_b)
    t = timeit(f_pb, sr2, bstart)
    rows = rb * LANES
    print(f"phase-b take 512B x {rows}: {t*1e3:8.2f} ms "
          f"({t/rows*1e9:5.1f} ns/row)", flush=True)

    # ---- whole per-window data path chained (sort excluded) ----
    def window_path(tbl, s, bstart):
        g = jnp.take(tbl, (s & jnp.uint32(0xFFFFF)).astype(jnp.int32), axis=0)
        g2 = pre_t(g)
        ids = jnp.minimum(bstart[None, :]
                          + jax.lax.broadcasted_iota(jnp.int32, (rb, 1), 0),
                          nb - 1).reshape(-1)
        return jnp.take(g2, ids, axis=0)
    f_wp = jax.jit(window_path)
    t = timeit(f_wp, tbl, srt, bstart)
    print(f"window path a+t+b chained: {t*1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
