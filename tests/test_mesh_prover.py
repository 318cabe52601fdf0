"""The REAL prover over the 8-device virtual CPU mesh (MeshBackend):
byte-exact golden parity + distributed kernel equivalences.

Reference behavior: bellman threads its Worker pool through
setup/prove/lagrange (src/plonk.rs:41,47,183); here the same prover code
runs over a jax Mesh via the backend abstraction, and the bar is the
reference's own determinism bar — byte-identical proof.bin
(src/tests.rs:68-72)."""

import pytest

from plonkit_tpu.api import SetupForProver, verify
from plonkit_tpu.frontend.circuit import CircomCircuit
from plonkit_tpu.frontend.r1cs import load_r1cs
from plonkit_tpu.frontend.witness import load_witness
from plonkit_tpu.parallel.backend_mesh import MeshBackend
@pytest.fixture(scope="module")
def mesh_backend():
    return MeshBackend(n_devices=8)


def test_mesh_prove_simple_golden_bytes(mesh_backend, simple_dir, srs):
    circ = CircomCircuit(r1cs=load_r1cs(simple_dir + "/circuit.r1cs.json"),
                         witness=load_witness(simple_dir + "/witness.json"))
    setup = SetupForProver(circ, srs, backend=mesh_backend)
    proof = setup.prove(circ)
    with open(simple_dir + "/proof.bin", "rb") as f:
        assert proof.to_bytes() == f.read()
    assert verify(setup.make_verification_key(), proof)


@pytest.mark.slow  # XLA-CPU compile of the sharded EC window graphs
def test_mesh_prove_with_sharded_msm_golden_bytes(monkeypatch, simple_dir,
                                                  srs):
    """The REAL prover with the SHARDED MSM inside it: every commitment in
    prove() runs through DistributedMSMContext (the packed single-chip
    engine sharded over the 8-device mesh) and the proof must still be
    byte-identical to the golden artifact."""
    monkeypatch.setenv("PLONKIT_TPU_MESH_MSM", "force")
    monkeypatch.setenv("PLONKIT_TPU_DIST_MSM_C", "8")
    backend = MeshBackend(n_devices=8)
    circ = CircomCircuit(r1cs=load_r1cs(simple_dir + "/circuit.r1cs.json"),
                         witness=load_witness(simple_dir + "/witness.json"))
    setup = SetupForProver(circ, srs, backend=backend)
    proof = setup.prove(circ)
    with open(simple_dir + "/proof.bin", "rb") as f:
        assert proof.to_bytes() == f.read()
    with open(simple_dir + "/vk.bin", "rb") as f:
        assert setup.make_verification_key().to_bytes() == f.read()


def test_mesh_backend_ops_match_host():
    """Sharded elementwise/scan/NTT ops vs the host oracle on a domain
    where the 4-step distributed NTT engages (n1, n2 both divisible by 8)."""
    from plonkit_tpu.backend import HostBackend
    import random

    from plonkit_tpu.fields import FR_MODULUS as R

    rng = random.Random(3)
    n = 1 << 12
    vals = [rng.randrange(R) for _ in range(n)]
    other = [rng.randrange(R) for _ in range(n)]
    hb = HostBackend()
    mb = MeshBackend(n_devices=8)

    v = mb.from_ints(vals)
    o = mb.from_ints(other)
    assert mb.to_ints(mb.mul(v, o)) == hb.mul(vals, other)
    assert mb.to_ints(mb.grand_product(v)) == hb.grand_product(vals)
    assert mb.to_ints(mb.intt(mb.ntt(v))) == vals
    assert mb.to_ints(mb.ntt(v)) == hb.ntt(vals)
    assert mb.to_ints(mb.coset_intt(mb.coset_ntt(v))) == vals
    assert mb.to_ints(mb.coset_lde(v, 4)) == hb.coset_lde(vals, 4)
    q = mb.divide_by_linear(v, 12345)
    assert mb.to_ints(q) == hb.divide_by_linear(vals, 12345)
