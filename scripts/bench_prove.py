#!/usr/bin/env python3
"""Full prove wall-time benchmark (the BASELINE.md "full prove wall-time"
metric; reference e2e workload: test/test_poseidon_plonk.sh — Poseidon at a
2^20 SRS).

Default circuit: a synthetic multiplication chain (z_{i+1} = z_i^2 + z_i).
With --poseidon, the flagship circomlib-parameter Poseidon hash chain
(frontend/poseidon.py) is sized so its transpiled gate count fills the 2^k
domain — the direct analogue of the reference's poseidon integration
circuit.  Dev SRS is generated on device, then SetupForProver.prove is
timed end to end (cold + warm) with a stage breakdown.

Usage: python scripts/bench_prove.py [log2_domain] [--poseidon]
                                     [--backend host|jax]
"""

import logging
import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

logging.basicConfig(level=logging.INFO, stream=sys.stderr,
                    format="%(asctime)s %(levelname)s %(message)s")

from plonkit_tpu.fields import FR_MODULUS as R
from plonkit_tpu.frontend.circuit import CircomCircuit
from plonkit_tpu.frontend.r1cs import R1CS


def synth_circuit(k: int):
    """~2^k constraints: z_{i+1} = z_i * z_i + z_i, one public output."""
    n = (1 << k) - 2  # leave room for the input gate + padding row
    rng = random.Random(99)
    z = [rng.randrange(R)]
    for _ in range(n):
        z.append((z[-1] * z[-1] + z[-1]) % R)
    # wires: 0 = ONE, 1 = z_n (public), 2..n+1 = z_0..z_{n-1}
    wires = [z[n]] + z[:n]
    constraints = []
    for i in range(n):
        zi = 2 + i
        znext = 1 if i == n - 1 else 3 + i
        constraints.append(([(zi, 1)], [(zi, 1)], [(znext, 1), (zi, R - 1)]))
    r1cs = R1CS(num_inputs=2, num_aux=n, num_variables=n + 2, constraints=constraints)
    return CircomCircuit(r1cs=r1cs, witness=[1] + wires)


def poseidon_chain_circuit(k: int):
    """Poseidon hash-chain circuit whose transpiled gate count fills the
    2^k domain (reference workload: test/test_poseidon_plonk.sh proves the
    circomlib Poseidon circuit against a 2^20 SRS).  Gate count is linear
    in the chain length, so two small transpiles calibrate the slope."""
    from plonkit_tpu.api import analyse
    from plonkit_tpu.frontend.poseidon import poseidon_circuit

    g1 = analyse(poseidon_circuit(2, chain=1)[0]).num_gates
    g2 = analyse(poseidon_circuit(2, chain=2)[0]).num_gates
    dg = g2 - g1
    # domain rows available: 2^k - 1 usable (n = 2^k - 1), keep slack for
    # the padding gates the setup appends
    if g1 > (1 << k) - 16:
        raise SystemExit(f"--poseidon needs k >= 12 (one hash = {g1} gates)")
    chain = max(1, (((1 << k) - 16) - g1) // dg + 1)
    t0 = time.time()
    circ, _ = poseidon_circuit(2, chain=chain)
    print(f"poseidon chain={chain} built in {time.time()-t0:.1f}s "
          f"(~{g1 + (chain-1)*dg} gates)", file=sys.stderr)
    return circ


def main():
    argv = list(sys.argv[1:])
    backend_name = "jax"
    if "--backend" in argv:
        i = argv.index("--backend")
        backend_name = argv[i + 1]
        del argv[i:i + 2]
    use_poseidon = "--poseidon" in argv
    args = [a for a in argv if not a.startswith("--")]
    k = int(args[0]) if args else 14

    import jax
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    try:  # persist XLA compiles (minutes through the remote-compile tunnel)
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(repo, ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    print(f"devices: {jax.devices()}", file=sys.stderr)

    t0 = time.time()
    if use_poseidon:
        circuit = poseidon_chain_circuit(k)
    else:
        circuit = synth_circuit(k)
    print(f"circuit 2^{k}: {time.time()-t0:.1f}s "
          f"({len(circuit.r1cs.constraints)} constraints)", file=sys.stderr)

    # dev SRS on device (tau=42)
    from plonkit_tpu.curve import G2_GEN, g2_mul
    from plonkit_tpu.serialization import Crs
    from plonkit_tpu.tpu.fixed_base import gen_crs_g1_device
    t0 = time.time()
    g1 = gen_crs_g1_device(k)
    crs = Crs(g1, [G2_GEN, g2_mul(G2_GEN, 42)])
    print(f"dev SRS 2^{k} on device: {time.time()-t0:.1f}s", file=sys.stderr)

    if backend_name == "host":
        from plonkit_tpu.backend import HostBackend
        backend = HostBackend()
    else:
        from plonkit_tpu.backend_jax import JaxBackend
        backend = JaxBackend()

    from plonkit_tpu.api import SetupForProver, verify

    t0 = time.time()
    setup = SetupForProver(circuit, crs, backend=backend)
    print(f"transpile+setup: {time.time()-t0:.1f}s", file=sys.stderr)

    t0 = time.time()
    proof = setup.prove(circuit)
    t_first = time.time() - t0
    print(f"prove (cold, incl. compile): {t_first:.1f}s", file=sys.stderr)

    from plonkit_tpu import profiling
    profiling.reset()
    t0 = time.time()
    proof = setup.prove(circuit)
    t_warm = time.time() - t0
    print(f"prove (warm): {t_warm:.1f}s", file=sys.stderr)
    for name, dt in profiling.last_timings.items():
        print(f"  [stage] {name:36s} {dt:7.2f}s", file=sys.stderr)

    t0 = time.time()
    vk = setup.make_verification_key()
    print(f"make vk: {time.time()-t0:.1f}s", file=sys.stderr)
    assert verify(vk, proof), "proof must verify"
    print(f"verified OK; proof bytes: {len(proof.to_bytes())}", file=sys.stderr)

    import json
    print(json.dumps({
        "metric": f"prove_wall_time_2^{k}",
        "value": round(t_warm, 2),
        "unit": "s",
        "backend": backend.name,
        "circuit": "poseidon" if use_poseidon else "synthetic",
    }))


if __name__ == "__main__":
    main()
