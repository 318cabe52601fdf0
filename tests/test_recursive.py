"""Tests for the recursive-aggregation foundations: batched verification,
rescue sponge, RNS limbs, vk Merkle tree."""

import os
import random

import pytest

from plonkit_tpu.fields import FQ_MODULUS, FR_MODULUS as R
from plonkit_tpu.serialization import Proof, VerificationKey


@pytest.fixture(scope="module")
def vk_and_proofs(simple_dir, srs):
    vk = VerificationKey.load(os.path.join(simple_dir, "vk.bin"))
    golden = Proof.load(os.path.join(simple_dir, "proof.bin"))
    # a second, distinct valid proof: same circuit, different witness (x=2 -> y=15)
    from plonkit_tpu.api import SetupForProver
    from plonkit_tpu.frontend import CircomCircuit, load_r1cs
    r1cs = load_r1cs(os.path.join(simple_dir, "circuit.r1cs.json"))
    c2 = CircomCircuit(r1cs=r1cs, witness=[1, 15, 2, 4])
    setup = SetupForProver(c2, srs)
    p2 = setup.prove(c2)
    return vk, [golden, p2]


def test_batch_verify(vk_and_proofs):
    from plonkit_tpu.recursive.batch import aggregate_proofs, verify_batch
    vk, proofs = vk_and_proofs
    assert verify_batch(vk, proofs)
    agg = aggregate_proofs(vk, proofs)
    assert agg is not None
    pg, px, limbs = agg
    # 2 points x 2 coords x 4 limbs
    assert len(limbs) == 16
    from plonkit_tpu.recursive.rns import limbs_to_fq
    assert limbs_to_fq(limbs[0:4]) == pg[0]


def test_batch_rejects_tampered(vk_and_proofs):
    from plonkit_tpu.recursive.batch import verify_batch
    vk, proofs = vk_and_proofs
    bad = Proof.read.__self__  # noqa -- placeholder, replaced below
    import copy
    p_bad = copy.deepcopy(proofs[1])
    p_bad.input_values = [(proofs[1].input_values[0] + 1) % R]
    assert not verify_batch(vk, [proofs[0], p_bad])


def test_rns_roundtrip():
    from plonkit_tpu.recursive import rns
    rng = random.Random(1)
    for _ in range(20):
        x = rng.randrange(FQ_MODULUS)
        assert rns.limbs_to_fq(rns.fq_to_limbs(x)) == x
        assert rns.double_limbs_to_fq(rns.fq_to_double_limbs(x)) == x
        assert rns.witness_to_fq(rns.fq_to_double_limbs(x)) == x


def test_rescue_sponge():
    from plonkit_tpu.recursive.rescue import rescue_hash, rescue_permutation
    a = rescue_hash([1, 2])
    b = rescue_hash([1, 2])
    c = rescue_hash([2, 1])
    assert a == b != c
    assert 0 <= a < R
    # permutation is a bijection-ish sanity: different inputs differ
    assert rescue_permutation([0, 0, 0]) != rescue_permutation([1, 0, 0])


def test_vk_tree(vk_and_proofs):
    from plonkit_tpu.recursive.vk_tree import (VK_TREE_DEPTH, build_vk_tree,
                                               merkle_query, merkle_verify,
                                               vk_tree_root)
    vk, _ = vk_and_proofs
    levels = build_vk_tree([vk])
    root = levels[-1][0]
    assert root == vk_tree_root([vk])
    assert len(levels) == VK_TREE_DEPTH + 1
    leaf, path = merkle_query(levels, 5)
    assert len(path) == VK_TREE_DEPTH
    assert merkle_verify(root, leaf, 5, path)
    assert not merkle_verify(root, (leaf + 1) % R, 5, path)
