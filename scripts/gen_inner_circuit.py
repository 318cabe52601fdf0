#!/usr/bin/env python3
"""Emit a synthetic inner circuit as circuit.r1cs.json + witness_i.json
(snarkjs JSON schema, the same files circom/snarkit would produce --
reference formats: src/circom_circuit.rs:15-24, src/reader.rs:101-110).

Circuit: product chain z_{i+1} = z_i^2 + z_i + 3 (k steps) plus a 10-term
linear combination -- populates every selector column of the width-4
system.  Two public inputs (z_k and the LC total); witness seed varies per
proof index so aggregated batches contain distinct proofs.
"""

import json
import os
import random
import sys

R = 21888242871839275222246405745257275088548364400416034343698204186575808495617
K = 24


def build(seed: int):
    rng = random.Random(1000 + seed)
    z = [rng.randrange(R)]
    for _ in range(K):
        z.append((z[-1] * z[-1] + z[-1] + 3) % R)
    total = (sum(z[:10]) + 7) % R
    wires = [z[K], total] + z[:K]
    constraints = []
    for i in range(K):
        zi = 3 + i
        znext = 1 if i == K - 1 else 4 + i
        constraints.append([{str(zi): "1"}, {str(zi): "1"},
                            {str(znext): "1", str(zi): str(R - 1), "0": str(R - 3)}])
    constraints.append([dict({"0": "7"}, **{str(3 + i): "1" for i in range(10)}),
                        {"0": "1"}, {"2": "1"}])
    r1cs = {
        "nPubInputs": 2,
        "nOutputs": 0,
        "nVars": 1 + len(wires),
        "constraints": constraints,
    }
    witness = ["1"] + [str(w) for w in wires]
    return r1cs, witness


def main():
    workdir = sys.argv[1] if len(sys.argv) > 1 else "."
    nproofs = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    r1cs, _ = build(0)
    with open(os.path.join(workdir, "circuit.r1cs.json"), "w") as f:
        json.dump(r1cs, f)
    for i in range(nproofs):
        _, witness = build(i)
        with open(os.path.join(workdir, f"witness_{i}.json"), "w") as f:
            json.dump(witness, f)
    print(f"wrote circuit.r1cs.json + {nproofs} witness file(s) to {workdir}")


if __name__ == "__main__":
    main()
