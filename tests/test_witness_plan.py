"""WitnessPlan fast paths vs the direct transpiler evaluation (the plan
replays witness extension without re-transpiling — it must be value-exact
for every wire column, and the raw-limb emission must match from_ints).

Reference behavior: per-prove synthesize (src/plonk.rs:140-170)."""

import random

import numpy as np

from plonkit_tpu.backend import from_ints_dedup
from plonkit_tpu.backend_jax import JaxBackend
from plonkit_tpu.fields import FR_MODULUS as R
from plonkit_tpu.frontend.circuit import CircomCircuit
from plonkit_tpu.frontend.r1cs import R1CS
from plonkit_tpu.frontend.transpiler import (Transpiler, build_witness_plan,
                                             synthesize_witness)


def _chain_circuit(n=50, seed=4):
    """Mix of multiplication gates and wide LCs (chained addition gates),
    so the plan covers collapse outputs AND chain accumulators."""
    rng = random.Random(seed)
    wires = [rng.randrange(R) for _ in range(n)]
    constraints = []
    # z_{i+1} = z_i * z_i  (aux wires 2..)
    vals = [1, 0] + wires
    for i in range(n - 1):
        a = [(2 + i, 1)]
        c = [(3 + i, 1)]
        constraints.append((a, a, c))
        vals[3 + i] = vals[2 + i] * vals[2 + i] % R
    # one wide LC: (z0 + 2 z1 + ... + 9 z8) * 1 = out
    wide = [(2 + j, j + 1) for j in range(9)]
    out_val = sum((j + 1) * vals[2 + j] for j in range(9)) % R
    vals[1] = out_val
    constraints.append((wide, [(0, 1)], [(1, 1)]))
    r1cs = R1CS(num_inputs=2, num_aux=n, num_variables=n + 2,
                constraints=constraints)
    return CircomCircuit(r1cs=r1cs, witness=vals)


def _direct_synthesize(circuit):
    """The pre-plan implementation: re-transpile with the witness bound."""
    t = Transpiler(circuit)
    for index, a, b, c in circuit.nontrivial_constraints():
        t.enforce(index, a, b, c)
    from plonkit_tpu.frontend.transpiler import STATE_WIDTH, TranspiledCircuit
    tc = TranspiledCircuit(
        num_input_variables=t.num_input_variables,
        num_aux_variables=t.next_aux - 1,
        gates=t.gates, hints=t.hints, constraint_stats=t.constraint_stats)
    cols = [[t.value_of(g.wires[j]) for g in tc.all_gates()]
            for j in range(STATE_WIDTH)]
    from plonkit_tpu.frontend.circuit import Var
    pub = [t.value_of(Var("input", i))
           for i in range(1, t.num_input_variables + 1)]
    return tc, cols, pub


def test_plan_matches_direct_transpile():
    circ = _chain_circuit()
    tc_d, cols_d, pub_d = _direct_synthesize(circ)
    tc_p, cols_p, pub_p = synthesize_witness(circ)
    assert cols_p == cols_d
    assert pub_p == pub_d
    assert tc_p.num_constraint_gates == tc_d.num_constraint_gates
    assert [g.selector_row() for g in tc_p.gates] == \
        [g.selector_row() for g in tc_d.gates]


def test_plan_reuse_with_new_witness():
    """One plan, two witnesses (the per-prove path)."""
    c1 = _chain_circuit(seed=4)
    plan = build_witness_plan(c1)
    c2 = _chain_circuit(seed=9)
    cols, pub = plan.evaluate(c2.witness)
    _, cols_d, pub_d = _direct_synthesize(c2)
    assert cols == cols_d and pub == pub_d


def test_evaluate_limbs_matches_from_ints():
    circ = _chain_circuit()
    plan = build_witness_plan(circ)
    cols, pub = plan.evaluate(circ.witness)
    size = 128
    raw_cols, pub2 = plan.evaluate_limbs(circ.witness, size)
    assert pub2 == pub
    b = JaxBackend()
    for col, raw in zip(cols, raw_cols):
        assert raw.shape == (16, size)
        want = b.to_ints(b.from_ints(col, pad_to=size))
        got = b.to_ints(b.from_raw_limbs(np.asarray(raw)))
        assert got == want


def test_from_ints_dedup_matches_from_ints():
    rng = random.Random(5)
    b = JaxBackend()
    sparse = [rng.choice([0, 1, R - 1, 424242]) for _ in range(500)]
    assert b.to_ints(from_ints_dedup(b, sparse, pad_to=512)) == \
        b.to_ints(b.from_ints(sparse, pad_to=512))
    dense = [rng.randrange(R) for _ in range(333)]
    assert b.to_ints(from_ints_dedup(b, dense)) == dense
