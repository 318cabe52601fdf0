"""End-to-end prove on the JAX backend must be byte-identical to the
reference proof.bin -- the cross-validation that the device compute path
implements the exact same math as the host oracle.  On the CPU test backend
the kernels use their jnp fallback (same limb algorithms, compiled); the
pallas kernels themselves are covered by test_tpu_field.py in interpret
mode."""

import os

import pytest

from plonkit_tpu.frontend import CircomCircuit, load_r1cs, load_witness
from plonkit_tpu.frontend.transpiler import synthesize_witness
from plonkit_tpu.plonk.prover import ProverContext, prove
from plonkit_tpu.plonk.setup import make_setup_polynomials, make_verification_key
from plonkit_tpu.serialization import Crs


@pytest.fixture(scope="module")
def jax_backend():
    from plonkit_tpu.backend_jax import JaxBackend
    return JaxBackend()


@pytest.mark.slow
def test_jax_backend_proof_bytes(simple_dir, srs, jax_backend):
    c = CircomCircuit(
        r1cs=load_r1cs(os.path.join(simple_dir, "circuit.r1cs.json")),
        witness=load_witness(os.path.join(simple_dir, "witness.json")),
    )
    tc, cols, pub = synthesize_witness(c)
    sp = make_setup_polynomials(tc)
    ctx = ProverContext(sp, srs, jax_backend)
    proof = prove(sp, cols, pub, ctx=ctx)
    with open(os.path.join(simple_dir, "proof.bin"), "rb") as f:
        golden = f.read()
    assert proof.to_bytes() == golden


@pytest.mark.slow
def test_jax_backend_vk_bytes(simple_dir, srs, jax_backend):
    c = CircomCircuit(r1cs=load_r1cs(os.path.join(simple_dir, "circuit.r1cs.json")))
    from plonkit_tpu.frontend.transpiler import transpile
    tc = transpile(c)
    sp = make_setup_polynomials(tc)
    vk = make_verification_key(sp, srs, backend=jax_backend)
    with open(os.path.join(simple_dir, "vk.bin"), "rb") as f:
        golden = f.read()
    assert vk.to_bytes() == golden
