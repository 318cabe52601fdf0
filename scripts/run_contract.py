#!/usr/bin/env python3
"""Execute a generated verifier contract on a proof via the solvm
interpreter — the image-local stand-in for the reference's hardhat step
("Verify via smart contract", .github/workflows/integration-test.yml;
test/contract/{single,recursive}/test/*.js).

Single:    run_contract.py verifier.sol proof.json public.json
Recursive: run_contract.py --recursive recursive_verifier.sol \
               recursive_proof.json

Exit 0 iff the contract accepts; also asserts the contract REJECTS a
tampered variant (flipped public input / scalar word).
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from plonkit_tpu.solvm import Interpreter, SolRevert  # noqa: E402


def _ints(values):
    return [int(v, 0) if isinstance(v, str) else int(v) for v in values]


def run_single(sol_path, proof_json, public_json):
    itp = Interpreter(open(sol_path).read())
    words = _ints(json.load(open(proof_json)))
    inputs = _ints(json.load(open(public_json)))
    ok = itp.call("verify_serialized_proof", inputs, words)
    assert ok == 1, "contract rejected a valid proof"
    print(f"contract ACCEPTED the proof ({len(inputs)} inputs, "
          f"{len(words)} words)")
    bad_inputs = [(inputs[0] + 1)] + inputs[1:]
    try:
        assert itp.call("verify_serialized_proof", bad_inputs, words) == 0
    except SolRevert:
        pass
    bad_words = list(words)
    bad_words[18] = (bad_words[18] + 1) % (1 << 253)
    try:
        assert itp.call("verify_serialized_proof", inputs, bad_words) == 0
    except SolRevert:
        pass
    print("contract REJECTED both tampered variants")


def run_recursive(sol_path, proof_json):
    itp = Interpreter(open(sol_path).read())
    blob = json.load(open(proof_json))
    limbs = _ints(blob["aggr_limbs"])
    vk_root = int(blob["vk_root"], 0) if isinstance(blob["vk_root"], str) \
        else int(blob["vk_root"])
    inputs = _ints(blob["individual_inputs"])
    words = _ints(blob["proof"])
    ok = itp.call("verifyAggregatedProof", limbs, vk_root, inputs, words)
    assert ok == 1, "recursive contract rejected a valid aggregated proof"
    print(f"recursive contract ACCEPTED ({len(inputs)} individual inputs)")
    bad = [(inputs[0] + 1)] + inputs[1:]
    try:
        assert itp.call("verifyAggregatedProof", limbs, vk_root, bad,
                        words) == 0
    except SolRevert:
        pass
    print("recursive contract REJECTED the tampered variant")


def main():
    args = [a for a in sys.argv[1:] if a != "--recursive"]
    if "--recursive" in sys.argv:
        run_recursive(args[0], args[1])
    else:
        run_single(args[0], args[1], args[2])


if __name__ == "__main__":
    main()


