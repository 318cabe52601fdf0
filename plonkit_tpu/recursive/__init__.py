"""Recursive proof aggregation (reference parity target: src/recursive/mod.rs
+ the matter-labs recursive_aggregation_circuit stack, SURVEY C8/D3/D5).

Status in this build:
  * batch.py  -- N-proof batched verification via random-linear-combination
    of the per-proof KZG pairing pairs (one pairing check for N proofs).
    This is the off-circuit core of `make_aggregate`
    (src/recursive/mod.rs:86): the aggregated (pair_with_generator,
    pair_with_x) pair that the reference exposes as limbed public inputs.
  * rescue.py -- Rescue permutation + sponge over Fr (the algebraic hash
    used for the vk Merkle tree and the in-circuit-cheap transcript).
    Parameters are self-generated (documented in-module); bit-compatibility
    with franklin-crypto's Bn256RescueParams requires its generation
    procedure and is tracked as follow-up work.
  * rns.py    -- non-native-field limb encoding (RnsParameters(68,110,4)
    semantics, src/utils.rs behavior): Fq elements as 68-bit limb witnesses
    inside Fr, used to expose the aggregated pairing pair as public inputs.

The remaining piece -- the in-circuit PLONK verifier (re-verifying N proofs
inside a width-4 circuit with custom gates, vk Merkle authentication, and
the recursive setup/prover over the 2^24 SRS) -- is the round-2 milestone;
its gate-level design follows the same transpile->setup->prove pipeline
this framework already implements.
"""

from .batch import aggregate_proofs, verify_aggregate
