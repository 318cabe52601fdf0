#!/usr/bin/env bash
# Recursive aggregation pipeline driver, mirroring the reference's
# test/test_poseidon_plonk_recursive.sh step order:
#   setup (big SRS) -> prove N inner proofs with rescue transcript ->
#   export-recursive-verification-key -> recursive-prove ->
#   recursive-verify -> check-aggregation -> generate-recursive-verifier.
#
# The inner circuit is a synthetic product-chain circuit (circom is not in
# this image; scripts/gen_inner_circuit.py emits r1cs.json + witness.json
# with the same wire/constraint semantics circom would produce).
#
# Usage: scripts/test_recursive_pipeline.sh [WORKDIR] [NPROOFS] [BIG_POWER]
set -ex

REPO="$(cd "$(dirname "$0")/.." && pwd)"
WORK="${1:-/tmp/plonkit_tpu_recursive_test}"
NPROOFS="${2:-1}"
BIG_POWER="${3:-22}"
CLI="python -m plonkit_tpu"
export PYTHONPATH="$REPO${PYTHONPATH:+:$PYTHONPATH}"

mkdir -p "$WORK"
cd "$WORK"

BIG_SRS="srs_2pow${BIG_POWER}.key"
SMALL_SRS="/root/reference/keys/setup/setup_2^10.key"

# 1. universal setup for the aggregation circuit
if [ ! -f "$BIG_SRS" ]; then
  time $CLI setup -p "$BIG_POWER" -m "$BIG_SRS"
fi

# 2. synthetic inner circuit + N witnesses
python "$REPO/scripts/gen_inner_circuit.py" "$WORK" "$NPROOFS"

# 3. inner vk + N rescue-transcript proofs
$CLI export-verification-key -m "$SMALL_SRS" -c circuit.r1cs.json -v vk.bin --overwrite
: > old_proof_list.txt
for i in $(seq 0 $((NPROOFS - 1))); do
  $CLI prove -m "$SMALL_SRS" -c circuit.r1cs.json -w "witness_${i}.json" \
      -p "proof_${i}.bin" -j "proof_${i}.json" -i "public_${i}.json" \
      -t rescue --overwrite
  $CLI verify -p "proof_${i}.bin" -v vk.bin -t rescue
  echo "$WORK/proof_${i}.bin" >> old_proof_list.txt
done

# 4. recursive vk (dummy-witness synthesis; structure-only)
time $CLI export-recursive-verification-key -c "$NPROOFS" -i 2 \
    -m "$BIG_SRS" -o vk.bin -v recursive_vk.bin --overwrite

# 5. aggregate
time $CLI recursive-prove -m "$BIG_SRS" -f old_proof_list.txt -v vk.bin \
    -n recursive_proof.bin -j recursive_proof.json --overwrite

# 6. verify natively
time $CLI recursive-verify -p recursive_proof.bin -v recursive_vk.bin

# 7. aggregate <-> originals correspondence
$CLI check-aggregation -o old_proof_list.txt -v vk.bin -n recursive_proof.bin

# 8. recursive verifier contract
$CLI generate-recursive-verifier -o vk.bin -n recursive_vk.bin \
    -i $((2 * NPROOFS)) -s recursive_verifier.sol --overwrite
test -s recursive_verifier.sol

# execute the recursive verifier contract on the aggregated proof
python "$REPO/scripts/run_contract.py" --recursive recursive_verifier.sol \
    recursive_proof.json

echo "RECURSIVE PIPELINE OK"
