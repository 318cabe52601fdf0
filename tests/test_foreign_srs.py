"""Foreign (non-tau-42) SRS ingestion: generate a random-tau monomial key
on device, write it in the reference's .key format, reload it through the
streaming CrsHandle path, and prove + verify against it.

Reference behavior: test/test_poseidon_plonk.sh:43-48 downloads the Aztec
Ignition 2^20 key (a production SRS with unknown tau) and proves against
it; src/reader.rs:67-71 is the 512 MiB-buffered load path CrsHandle
mirrors.  Every prior e2e here used the committed tau=42 dev key, so this
is the first non-dev-SRS pipeline.  The TPU-scale (2^20) run of the same
flow is scripts/foreign_srs_bench.py."""

import os
import random

import pytest

from plonkit_tpu.api import SetupForProver, verify
from plonkit_tpu.curve import G2_GEN, g2_mul
from plonkit_tpu.fields import FR_MODULUS as R
from plonkit_tpu.serialization import Crs, CrsHandle


@pytest.mark.slow
def test_foreign_srs_roundtrip_and_prove(tmp_path):
    power = 12
    tau = random.Random(424242).randrange(2, R)  # NOT the dev tau
    from plonkit_tpu.tpu.fixed_base import gen_crs_g1_device
    g1 = gen_crs_g1_device(power, tau=tau)
    crs = Crs(g1, [G2_GEN, g2_mul(G2_GEN, tau)])
    path = os.path.join(tmp_path, "foreign.key")
    crs.save(path)
    # expected size: 8 + n*64 + 8 + 2*128 (reference format, SURVEY D1b)
    n = 1 << power
    assert os.path.getsize(path) == 8 + n * 64 + 8 + 2 * 128

    handle = CrsHandle(path)
    assert handle.num_g1 == n
    # streaming limb load matches the eager reader over the full prefix:
    # convert the raw limb arrays back to affine ints and compare all 256
    # points (an unused g1_limbs() result would let a limb-packing
    # regression through)
    x_raw, y_raw, inf = handle.g1_limbs(256)
    eager = Crs.load(path)
    assert eager.g1_bases[:256] == g1[:256]

    def limbs_to_int(col):
        return sum(int(col[i]) << (16 * i) for i in range(col.shape[0]))

    import numpy as np
    x_np, y_np, inf_np = (np.asarray(a) for a in (x_raw, y_raw, inf))
    for i in range(256):
        if inf_np[i]:
            assert eager.g1_bases[i] is None
        else:
            assert eager.g1_bases[i] == (limbs_to_int(x_np[:, i]),
                                         limbs_to_int(y_np[:, i])), i

    # prove the flagship Poseidon circuit against the foreign key
    from plonkit_tpu.frontend.poseidon import poseidon_circuit
    circ, out = poseidon_circuit(2, chain=1, inputs=[3, 4])
    setup = SetupForProver(circ, CrsHandle(path))
    proof = setup.prove(circ)
    vk = setup.make_verification_key()
    assert verify(vk, proof)
    assert proof.input_values == [out]
    # a vk built over the dev tau=42 key must NOT verify this proof
    g1_dev = gen_crs_g1_device(power, tau=42)
    crs_dev = Crs(g1_dev, [G2_GEN, g2_mul(G2_GEN, 42)])
    vk_dev = SetupForProver(circ, crs_dev).make_verification_key()
    assert not verify(vk_dev, proof)
