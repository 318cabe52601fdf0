"""Gadget layer for the aggregation circuit: in-circuit rescue /
transcript / Merkle must agree with the host implementations, and all
emitted constraints must be satisfiable."""

import pytest

from plonkit_tpu.fields import FR_MODULUS as R
from plonkit_tpu.plonk.extended import validate_witness2
from plonkit_tpu.recursive.cs import CsBuilder
from plonkit_tpu.recursive.rescue import RescueTranscript, rescue_hash
from plonkit_tpu.recursive.rescue_gadget import (RescueTranscriptGadget,
                                                 merkle_verify_gadget,
                                                 rescue_hash_gadget)


def check_satisfied(cs):
    setup = cs.setup()
    validate_witness2(setup, cs.wire_columns(), cs.public_inputs())
    return setup


def test_rescue_hash_gadget_matches_host():
    cs = CsBuilder()
    inputs = [123456789, 987654321, 42]
    nums = [cs.alloc(v) for v in inputs]
    out = rescue_hash_gadget(cs, nums)
    assert out.value == rescue_hash(inputs)
    check_satisfied(cs)


def test_rescue_transcript_gadget_matches_host():
    cs = CsBuilder()
    host = RescueTranscript()
    gadget = RescueTranscriptGadget(cs)
    for v in (5, 7, 11, 13, 17):
        host.update_fr(v)
        gadget.update_fr(cs.alloc(v))
    c1h = host.get_challenge()
    c1g = gadget.get_challenge()
    assert c1g.value == c1h
    host.update_fr(99)
    gadget.update_fr(cs.alloc(99))
    c2h = host.get_challenge()
    c2g = gadget.get_challenge()
    assert c2g.value == c2h
    # interleaved empty flush: consecutive challenges with no absorbs
    assert gadget.get_challenge().value == host.get_challenge()
    check_satisfied(cs)


def test_merkle_gadget_matches_host_tree():
    from plonkit_tpu.recursive.vk_tree import (build_vk_tree, merkle_query,
                                               merkle_verify)
    from plonkit_tpu.serialization import VerificationKey

    # synthetic "vk" leaves: just hash integers as leaves via direct levels
    leaves = [rescue_hash([i, i + 1]) for i in range(8)]
    levels = [leaves]
    cur = leaves
    while len(cur) > 1:
        cur = [rescue_hash([cur[i], cur[i + 1]]) for i in range(0, len(cur), 2)]
        levels.append(cur)
    root = levels[-1][0]
    index = 5
    leaf, path = merkle_query(levels, index)
    assert merkle_verify(root, leaf, index, path)

    cs = CsBuilder()
    leaf_n = cs.alloc(leaf)
    root_n = cs.alloc(root)
    bits = [cs.boolean((index >> i) & 1) for i in range(3)]
    path_n = [cs.alloc(p) for p in path]
    merkle_verify_gadget(cs, leaf_n, bits, path_n, root_n)
    check_satisfied(cs)

    # negative: wrong root must make the system unsatisfiable
    cs2 = CsBuilder()
    merkle_verify_gadget(cs2, cs2.alloc(leaf),
                         [cs2.boolean((index >> i) & 1) for i in range(3)],
                         [cs2.alloc(p) for p in path], cs2.alloc(root + 1))
    from plonkit_tpu.plonk.extended import ProverError
    with pytest.raises(ProverError):
        check_satisfied(cs2)
