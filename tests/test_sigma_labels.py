"""Device-built sigma polynomials (label-index path) vs the python-int
materialization.

SetupPolynomials stores permutations as label indices (c*size + r ->
K_COLS[c]*omega^r); JaxBackend.perm_from_labels evaluates them with a
device pow-scan + gather while the lazy `permutations` property
materializes python ints.  Both views must agree exactly — the vk golden
byte test covers the composition, this pins the two representations
against each other directly (and the extended system's copy of the same
scheme).

Reference behavior: better_cs setup sigma construction (SURVEY D1g)."""

import os

from plonkit_tpu.backend_jax import JaxBackend
from plonkit_tpu.fields import FR_MODULUS as R, get_domain_omega
from plonkit_tpu.frontend.circuit import CircomCircuit
from plonkit_tpu.frontend.transpiler import build_witness_plan
from plonkit_tpu.plonk.setup import K_COLS, make_setup_polynomials

SIMPLE = "/root/reference/test/circuits/simple"


def _simple_setup():
    from plonkit_tpu.frontend.r1cs import load_r1cs
    from plonkit_tpu.frontend.witness import load_witness
    circuit = CircomCircuit(
        r1cs=load_r1cs(os.path.join(SIMPLE, "circuit.r1cs.json")),
        witness=load_witness(os.path.join(SIMPLE, "witness.json")))
    return make_setup_polynomials(build_witness_plan(circuit).tc)


def test_perm_from_labels_matches_int_view():
    sp = _simple_setup()
    assert sp.perm_label_idx is not None
    b = JaxBackend()
    dev = b.perm_from_labels(sp.perm_label_idx)
    for c in range(4):
        assert b.to_ints(dev[c]) == sp.permutations[c]


def test_label_semantics():
    """Label j == K_COLS[j // size] * omega^(j % size): spot-check the
    identity rows and one rotated cycle cell against first principles."""
    sp = _simple_setup()
    size = sp.domain_size
    omega = get_domain_omega(size)
    perms = sp.permutations
    idx = sp.perm_label_idx
    for c in range(4):
        for r in (0, 1, size - 1):
            j = int(idx[c][r])
            assert perms[c][r] == K_COLS[j // size] * pow(omega, j % size, R) % R


def test_extended_labels_match_int_view():
    from plonkit_tpu.plonk.extended import make_setup_polynomials2
    # tiny synthetic extended system: 1 public input, 3 gate rows with a
    # shared variable to force a >1-cycle rotation
    wires = [(1, 2, 3, 0), (2, 3, 0, 0), (3, 1, 2, 0)]
    sels = [(1, 1, 1, 0, 0, 5, 0, 0)] * 3
    sp2 = make_setup_polynomials2(1, [1], wires, sels)
    assert sp2.perm_label_idx is not None
    b = JaxBackend()
    dev = b.perm_from_labels(sp2.perm_label_idx)
    for c in range(4):
        assert b.to_ints(dev[c]) == sp2.permutations[c]
