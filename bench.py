#!/usr/bin/env python3
"""Benchmark driver hook: prints one JSON line per north-star metric.

Headline metrics (BASELINE.json north-stars), each as a JSON line on
stdout:
  1. prove_wall_time_2^20 — warm full-prover wall-time on the flagship
     circomlib-parameter Poseidon chain circuit at the 2^20 domain
     (reference e2e workload: test/test_poseidon_plonk.sh).  Baseline:
     single-core bellman_ce-class CPU provers run this workload in
     ~180 s (the reference's CI allots a 15-min job for the whole
     pipeline); vs_baseline = baseline / measured (higher is better).
  2. msm_points_per_sec_2^20 — BN254 G1 MSM points/sec/chip (printed
     LAST: the driver's single-metric parse picks it up, keeping the
     recorded series comparable with rounds 1-4).

vs_baseline for the MSM: the reference publishes no numbers and its Rust
toolchain is not in this image, so the baseline is the commonly-measured
single-core bellman_ce-class CPU Pippenger throughput of ~0.7M points/s
at 2^20.  The BASELINE.md target is >=20x that.

BENCH_PROVE=0 skips the prove metric (MSM only).  Heavy inputs (bench
bases, the 2^20 dev SRS) are disk-cached under .bench_cache/.
"""

import json
import logging
import os
import sys
import time

BASELINE_POINTS_PER_SEC = 700_000.0
BASELINE_PROVE_SECONDS = 180.0

MSM_SIZE_LOG2 = int(os.environ.get("BENCH_MSM_LOG2", "20"))
PROVE_LOG2 = int(os.environ.get("BENCH_PROVE_LOG2", "20"))

logging.basicConfig(level=logging.INFO, stream=sys.stderr,
                    format="%(asctime)s %(levelname)s %(message)s")


def log(*args):
    print(*args, file=sys.stderr, flush=True)


def bench_prove(repo):
    """North-star #2: warm 2^20 Poseidon prove wall-time on one chip.
    Returns the JSON dict (printed by main before the MSM line)."""
    k = PROVE_LOG2
    from plonkit_tpu.api import SetupForProver, verify
    from plonkit_tpu.curve import G2_GEN, g2_mul
    from plonkit_tpu.serialization import Crs, CrsHandle
    from plonkit_tpu.tpu.fixed_base import gen_crs_g1_device
    from scripts.bench_prove import poseidon_chain_circuit

    t0 = time.time()
    circuit = poseidon_chain_circuit(k)
    log(f"poseidon circuit 2^{k}: {time.time()-t0:.1f}s")

    key_path = os.path.join(repo, ".bench_cache", f"srs_tau42_2pow{k}.key")
    if not os.path.exists(key_path):
        t0 = time.time()
        g1 = gen_crs_g1_device(k)
        crs = Crs(g1, [G2_GEN, g2_mul(G2_GEN, 42)])
        os.makedirs(os.path.dirname(key_path), exist_ok=True)
        crs.save(key_path)
        log(f"dev SRS 2^{k} generated + cached: {time.time()-t0:.1f}s")
    crs = CrsHandle(key_path)

    t0 = time.time()
    setup = SetupForProver(circuit, crs)
    log(f"transpile+setup: {time.time()-t0:.1f}s")

    t0 = time.time()
    proof = setup.prove(circuit)
    log(f"prove (cold, incl. compile): {time.time()-t0:.1f}s")

    from plonkit_tpu import profiling
    profiling.reset()
    t0 = time.time()
    proof = setup.prove(circuit)
    t_warm = time.time() - t0
    log(f"prove (warm): {t_warm:.1f}s")
    for name, dt in profiling.last_timings.items():
        log(f"  [stage] {name:36s} {dt:7.2f}s")
    vk = setup.make_verification_key()
    assert verify(vk, proof), "bench proof must verify"

    return {
        "metric": f"prove_wall_time_2^{k}",
        "value": round(t_warm, 2),
        "unit": "s",
        "vs_baseline": round(BASELINE_PROVE_SECONDS / t_warm, 2),
    }


def main():
    repo = os.path.dirname(os.path.abspath(__file__))
    sys.path.insert(0, repo)
    import random

    import jax
    import numpy as np

    prove_line = None
    if os.environ.get("BENCH_PROVE", "1") != "0":
        try:
            jax.config.update("jax_compilation_cache_dir",
                              os.path.join(repo, ".jax_cache"))
            jax.config.update("jax_persistent_cache_min_compile_time_secs",
                              1.0)
        except Exception:
            pass
        try:
            prove_line = bench_prove(repo)
        except Exception as e:  # never lose the MSM metric to a prove issue
            log(f"prove bench failed: {type(e).__name__}: {e}")

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

    if prove_line is not None:
        print(json.dumps(prove_line))
    print(json.dumps({
        "metric": f"msm_points_per_sec_2^{MSM_SIZE_LOG2}",
        "value": round(pps),
        "unit": "points/s",
        "vs_baseline": round(pps / BASELINE_POINTS_PER_SEC, 2),
    }))


if __name__ == "__main__":
    main()
