#!/usr/bin/env python3
"""Foreign-SRS pipeline at production scale (reference behavior:
test/test_poseidon_plonk.sh:43-48 downloads the 2^20 Aztec Ignition key —
a production SRS with unknown tau — and proves the Poseidon circuit
against it; src/reader.rs:67-71 is the 512 MiB-buffered load path that
CrsHandle mirrors).

Flow: generate a random-tau 2^20 monomial key ON DEVICE -> save in the
reference's .key format -> reload through the streaming CrsHandle limb
path -> prove the flagship Poseidon chain circuit -> verify.  Timings for
every stage go to stderr; the committed log is the scale evidence for the
2^12 ingestion test (tests/test_foreign_srs.py).

Usage: python scripts/foreign_srs_bench.py [log2=20] [--keep]
"""

import logging
import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

logging.basicConfig(level=logging.INFO, stream=sys.stderr,
                    format="%(asctime)s %(levelname)s %(message)s")


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    k = int(args[0]) if args else 20
    keep = "--keep" in sys.argv

    import jax
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(repo, ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    log(f"devices: {jax.devices()}")

    from plonkit_tpu.api import SetupForProver, verify
    from plonkit_tpu.curve import G2_GEN, g2_mul
    from plonkit_tpu.fields import FR_MODULUS as R
    from plonkit_tpu.serialization import Crs, CrsHandle
    from plonkit_tpu.tpu.fixed_base import gen_crs_g1_device

    tau = random.Random(987654321).randrange(2, R)  # NOT the dev tau
    path = os.path.join(repo, "scratch", f"foreign_2pow{k}.key")

    if os.path.exists(path) and \
            os.path.getsize(path) == 8 + (1 << k) * 64 + 8 + 2 * 128:
        log(f"reusing existing foreign key {path}")
    else:
        t0 = time.time()
        g1 = gen_crs_g1_device(k, tau=tau)
        crs = Crs(g1, [G2_GEN, g2_mul(G2_GEN, tau)])
        log(f"random-tau 2^{k} SRS generated on device: "
            f"{time.time()-t0:.1f}s")

        t0 = time.time()
        crs.save(path)
        sz = os.path.getsize(path)
        assert sz == 8 + (1 << k) * 64 + 8 + 2 * 128, sz
        log(f"saved {sz/2**20:.1f} MiB key: {time.time()-t0:.1f}s")

    t0 = time.time()
    handle = CrsHandle(path)
    assert handle.num_g1 == 1 << k
    # pull the full limb arrays once — the streaming load the prover uses
    x_raw, y_raw, inf = handle.g1_limbs(1 << k)
    log(f"streaming limb load (reader.rs:67-71 analogue): "
        f"{time.time()-t0:.1f}s")

    from scripts.bench_prove import poseidon_chain_circuit
    t0 = time.time()
    circuit = poseidon_chain_circuit(k)
    log(f"poseidon circuit 2^{k}: {time.time()-t0:.1f}s")

    from plonkit_tpu.backend_jax import JaxBackend
    t0 = time.time()
    setup = SetupForProver(circuit, CrsHandle(path), backend=JaxBackend())
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

    t0 = time.time()
    vk = setup.make_verification_key()
    log(f"make vk: {time.time()-t0:.1f}s")
    assert verify(vk, proof), "proof must verify against the foreign vk"
    log("verified OK against the foreign-tau SRS")

    if not keep:
        os.unlink(path)

    import json
    print(json.dumps({
        "metric": f"foreign_srs_prove_wall_time_2^{k}",
        "value": round(t_warm, 2), "unit": "s"}))


if __name__ == "__main__":
    main()
