"""Smoke: synthesize the N=1 aggregation circuit over a rich synthetic
inner circuit (all selectors used, no identity commitments)."""
import os, sys, time
os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, "/root/repo")
import random
from plonkit_tpu.api import SetupForProver, verify
from plonkit_tpu.fields import FR_MODULUS as R
from plonkit_tpu.frontend.circuit import CircomCircuit
from plonkit_tpu.frontend.r1cs import R1CS
from plonkit_tpu.serialization import Crs
from plonkit_tpu.backend import HostBackend


def rich_inner_circuit(k=24, seed=7):
    """Product chain + long LC + constants: populates every selector
    column, big enough that every commitment is non-identity."""
    rng = random.Random(seed)
    z = [rng.randrange(R)]
    for _ in range(k):
        z.append((z[-1] * z[-1] + z[-1] + 3) % R)
    total = (sum(z[:10]) + 7) % R
    # wires: 1 = z_k (public), 2 = total (public), 3..k+3 = z_0..z_{k-1}
    wires = [z[k], total] + z[:k]
    constraints = []
    for i in range(k):
        zi = 3 + i
        znext = 1 if i == k - 1 else 4 + i
        constraints.append(([(zi, 1)], [(zi, 1)],
                            [(znext, 1), (zi, R - 1), (0, R - 3)]))
    constraints.append(([(0, 7)] + [(3 + i, 1) for i in range(10)],
                        [(0, 1)], [(2, 1)]))
    num_inputs = 3  # ONE + 2 public
    num_vars = 1 + len(wires)
    r1cs = R1CS(num_inputs=num_inputs, num_aux=num_vars - num_inputs,
                num_variables=num_vars, constraints=constraints)
    return CircomCircuit(r1cs=r1cs, witness=[1] + wires)


if __name__ == "__main__":
    crs = Crs.load("/root/reference/keys/setup/setup_2^10.key")
    c = rich_inner_circuit()
    setup = SetupForProver(c, crs, backend=HostBackend())
    vk = setup.make_verification_key()
    pr = setup.prove(c, "rescue")
    print("inner rescue proof ok:", verify(vk, pr, "rescue"))
    print("identity vk points:",
          sum(p is None for p in vk.selector_commitments
              + vk.next_step_selector_commitments + vk.permutation_commitments))
    print("identity proof points:",
          sum(p is None for p in list(pr.wire_commitments)
              + [pr.grand_product_commitment]
              + list(pr.quotient_poly_commitments)
              + [pr.opening_at_z_proof, pr.opening_at_z_omega_proof]))

    t0 = time.time()
    from plonkit_tpu.recursive.aggregation import (build_aggregation_circuit,
                                                   expected_aggregated_input)
    cs, limbs = build_aggregation_circuit(vk, [pr])
    t1 = time.time()
    print(f"synthesis: {t1-t0:.1f}s, gates={cs.num_gates}, vars={len(cs.values)}")
    exp = expected_aggregated_input(vk, [pr])
    assert exp is not None, "host says batch invalid!"
    print("host/circuit limb match:", exp[1] == limbs)
    print("host/circuit hash match:", exp[0] == cs.public_inputs()[0])
