"""End-to-end prove+verify on synthetic R1CS circuits covering transpiler
paths the golden artifacts don't exercise: long linear combinations
(D-next chained addition gates), constant-product constraints, merged
linear constraints, and multi-input circuits."""

import random

import pytest

from plonkit_tpu.api import SetupForProver, gen_key_monomial_form, verify
from plonkit_tpu.fields import FR_MODULUS as R
from plonkit_tpu.frontend.circuit import CircomCircuit
from plonkit_tpu.frontend.r1cs import R1CS


@pytest.fixture(scope="module")
def srs_1024(srs):
    return srs  # reference dev SRS at 2^10


def _mk_circuit(num_pub, witness_vals, constraints):
    """witness_vals: values for wires 1.. (wire 0 = ONE).  The first num_pub
    of them are public."""
    num_inputs = 1 + num_pub
    num_vars = 1 + len(witness_vals)
    r1cs = R1CS(
        num_inputs=num_inputs,
        num_aux=num_vars - num_inputs,
        num_variables=num_vars,
        constraints=constraints,
    )
    return CircomCircuit(r1cs=r1cs, witness=[1] + list(witness_vals))


def _prove_verify(circuit, srs):
    setup = SetupForProver(circuit, srs)
    vk = setup.make_verification_key()
    proof = setup.prove(circuit)
    assert verify(vk, proof), "proof must verify"
    # tamper check
    bad = proof
    bad.input_values = [(v + 1) % R for v in bad.input_values]
    assert not verify(vk, bad)


def test_long_linear_combination(srs_1024):
    # y = sum of 10 private wires (exercises chained addition gates):
    # constraint: (sum_i w_i + 7) * 1 = y
    rng = random.Random(3)
    ws = [rng.randrange(R) for _ in range(10)]
    y = (sum(ws) + 7) % R
    # wires: 1=y (public), 2..11 = ws
    a = [(0, 7)] + [(i + 2, 1) for i in range(10)]
    constraints = [(a, [(0, 1)], [(1, 1)])]
    c = _mk_circuit(1, [y] + ws, constraints)
    _prove_verify(c, srs_1024)


def test_product_chain(srs_1024):
    # z_{i+1} = z_i * z_i + z_i ; public output after k steps
    rng = random.Random(4)
    k = 12
    z = [rng.randrange(R)]
    for _ in range(k):
        z.append((z[-1] * z[-1] + z[-1]) % R)
    # wires: 1 = z_k (public), 2..k+2 = z_0..z_{k-1}... layout: private z_0..z_{k-1}
    # constraint i: z_i * z_i = z_{i+1} - z_i
    wires = [z[k]] + z[:k]
    constraints = []
    for i in range(k):
        zi = 2 + i  # wire of z_i
        znext = 1 if i == k - 1 else 3 + i
        constraints.append((
            [(zi, 1)], [(zi, 1)], [(znext, 1), (zi, R - 1)],
        ))
    c = _mk_circuit(1, wires, constraints)
    _prove_verify(c, srs_1024)


def test_constant_sides(srs_1024):
    # constraints with constant a/b sides:
    #   (5) * (x) = y        -> merged linear constraint
    #   (x) * (x) = 25       -> constant C
    x = 5
    y = 25
    constraints = [
        ([(0, 5)], [(2, 1)], [(1, 1)]),
        ([(2, 1)], [(2, 1)], [(0, 25)]),
    ]
    c = _mk_circuit(1, [y, x], constraints)
    _prove_verify(c, srs_1024)


def test_multi_public_inputs(srs_1024):
    # 3 public inputs a,b,c with c = a*b + a + b
    rng = random.Random(5)
    a, b = rng.randrange(R), rng.randrange(R)
    cc = (a * b + a + b) % R
    constraints = [
        ([(1, 1)], [(2, 1)], [(3, 1), (1, R - 1), (2, R - 1)]),
    ]
    c = _mk_circuit(3, [a, b, cc], constraints)
    _prove_verify(c, srs_1024)


def test_trivial_constraints_skipped(srs_1024):
    # 0 * LC = 0 rows must be ignored (circom emits them)
    x = 9
    constraints = [
        ([], [(2, 1)], []),                      # trivial
        ([(2, 1)], [(2, 1)], [(1, 1)]),          # x*x = y
    ]
    c = _mk_circuit(1, [81, x], constraints)
    _prove_verify(c, srs_1024)
