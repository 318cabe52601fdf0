#!/usr/bin/env python3
"""Benchmark driver hook: prints ONE JSON line with the headline metric.

Headline (BASELINE.json north-star): BN254 G1 MSM points/sec/chip at 2^20.

vs_baseline: the reference (fluidex/plonkit) publishes no numbers and its
Rust toolchain is not present in this image, so the baseline is the
commonly-measured single-core bellman_ce-class CPU Pippenger throughput of
~0.7M points/s at 2^20 (a 2^20 MSM in ~1.5s single-threaded), recorded here
as BASELINE_POINTS_PER_SEC.  The BASELINE.md target is >=20x that.

Supplementary metrics (NTT wall-time, prove wall-time on a synthetic
circuit) go to stderr.
"""

import json
import os
import sys
import time

BASELINE_POINTS_PER_SEC = 700_000.0

MSM_SIZE_LOG2 = int(os.environ.get("BENCH_MSM_LOG2", "20"))


def log(*args):
    print(*args, file=sys.stderr, flush=True)


def main():
    repo = os.path.dirname(os.path.abspath(__file__))
    sys.path.insert(0, repo)
    import random

    import jax
    import numpy as np

    # XLA compiles of the limb kernels take minutes through the remote-compile
    # tunnel; persist them so repeat bench runs start hot.
    try:
        jax.config.update("jax_compilation_cache_dir", os.path.join(repo, ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    log(f"devices: {jax.devices()}")

    import jax.numpy as jnp
    from plonkit_tpu.fields import FR_MODULUS as R
    from plonkit_tpu.tpu import ec, ntt as tntt
    from plonkit_tpu.tpu.fixed_base import (affine_batch_to_host,
                                            batch_scalar_mul_base,
                                            to_affine_batch)
    from plonkit_tpu.tpu.mont import FQ, FR, NLIMBS
    from plonkit_tpu.tpu.msm import MSMContext

    n = 1 << MSM_SIZE_LOG2
    BASE_SEED = 1234
    BASE_GEN_VERSION = 1  # bump when base-generation code changes
    rng = random.Random(BASE_SEED)

    # ---- synthesize n distinct bases (disk-cached: ~2.5 min on device) ----
    cache = os.path.join(
        repo, ".bench_cache",
        f"bases_{MSM_SIZE_LOG2}_s{BASE_SEED}_v{BASE_GEN_VERSION}.npz")
    legacy = os.path.join(repo, ".bench_cache", f"bases_{MSM_SIZE_LOG2}.npz")
    if not os.path.exists(cache) and os.path.exists(legacy):
        cache = legacy  # same seed/version; pre-rename cache file
    if os.path.exists(cache):
        log(f"loading bench bases from {cache}...")
        t0 = time.time()
        blob = np.load(cache)
        x = jnp.asarray(blob["x"])
        y = jnp.asarray(blob["y"])
        inf = jnp.asarray(blob["inf"])
        x.block_until_ready()
        log(f"bases ready in {time.time() - t0:.1f}s")
    else:
        log(f"generating {n} bench bases on device...")
        t0 = time.time()
        jac = batch_scalar_mul_base([rng.randrange(1, R) for _ in range(n)])
        aff = to_affine_batch(jac)
        x, y, inf = aff
        x.block_until_ready()
        log(f"bases ready in {time.time() - t0:.1f}s")
        try:
            os.makedirs(os.path.dirname(cache), exist_ok=True)
            np.savez(cache, x=np.asarray(x), y=np.asarray(y),
                     inf=np.asarray(inf))
        except Exception as e:  # disk-full etc. -- cache is best-effort
            log(f"base cache write skipped: {e}")

    # build MSM context directly from device affine arrays; host fallback
    # materializes the bases only if a flagged add / lane overflow ever fires
    ctx = MSMContext.from_device_affine(
        x, y, inf,
        host_points_loader=lambda: affine_batch_to_host((x, y, inf)))

    # scalars device-resident in Montgomery form: the headline measures the
    # prover's msm_vec path (witness polys are already on device when the
    # prover commits, see backend_jax.JaxBackend).  Dedicated RNG so the
    # scalar stream is identical whether or not bases came from cache.
    from plonkit_tpu.tpu import mont
    srng = random.Random(5678)
    scalars = [srng.randrange(R) for _ in range(n)]
    v_mont = jax.jit(lambda raw: mont.to_mont(FR, raw))(
        jnp.asarray(FR.to_limbs_np(scalars)))
    v_mont.block_until_ready()

    log("warmup / compile...")
    t0 = time.time()
    _ = ctx.msm_vec(v_mont)
    log(f"first msm (incl. compile): {time.time() - t0:.1f}s")

    # e2e per-call (includes the host round-trip for the on-device
    # overflow/degenerate flag check — inflated by ~200 ms of axon-tunnel
    # dispatch latency on this harness, ~0.1 ms on a local chip)
    runs = 3
    t0 = time.time()
    for _ in range(runs):
        _ = ctx.msm_vec(v_mont)
    dt_e2e = (time.time() - t0) / runs
    log(f"msm 2^{MSM_SIZE_LOG2} e2e per-call: {dt_e2e * 1000:.1f} ms "
        f"-> {n / dt_e2e / 1e6:.2f}M points/s")

    # device throughput (slope over queued dispatches of the fused MSM
    # program, one sync — the number that composes inside prove(), where
    # many device ops queue back-to-back)
    ck = ctx.chunks[0]
    from plonkit_tpu.tpu.msm import _msm_vec_jit
    fn = _msm_vec_jit(ck.n8, v_mont.shape[1], ck.lanes, ctx.c,
                      ctx.num_windows, ck.uni_key, ck.mid_key, ck.top_key,
                      ctx._use_pallas)

    def burst(k):
        t0 = time.time()
        for _ in range(k):
            res, ovf, bad = fn(ck.tbl, v_mont)
        jax.device_get(ovf)
        return time.time() - t0

    burst(1)
    dt = (burst(6) - burst(2)) / 4
    pps = n / dt
    log(f"msm 2^{MSM_SIZE_LOG2} device throughput: {dt * 1000:.1f} ms "
        f"-> {pps / 1e6:.2f}M points/s")

    # ---- supplementary: NTT through the prover's backend dispatch ---------
    # (JaxBackend.ntt routes 2^17+ sizes to the MXU matmul engine,
    # tpu/ntt_mxu.py; measuring tpu.ntt directly would report the Pease
    # fallback instead of what prove() actually runs)
    from plonkit_tpu.backend_jax import FrVec, JaxBackend
    bk = JaxBackend()
    big = FrVec(jnp.asarray(
        np.random.randint(0, 2 ** 16, size=(16, n)).astype(np.uint32)))
    r = bk.ntt(big)
    r.data.block_until_ready()
    t0 = time.time()
    for _ in range(5):
        r = bk.ntt(r)
    r.data.block_until_ready()
    ntt_ms = (time.time() - t0) / 5 * 1000
    log(f"ntt 2^{MSM_SIZE_LOG2} (backend dispatch): {ntt_ms:.1f} ms")

    print(json.dumps({
        "metric": f"msm_points_per_sec_2^{MSM_SIZE_LOG2}",
        "value": round(pps),
        "unit": "points/s",
        "vs_baseline": round(pps / BASELINE_POINTS_PER_SEC, 2),
    }))


if __name__ == "__main__":
    main()
