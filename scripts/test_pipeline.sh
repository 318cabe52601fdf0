#!/usr/bin/env bash
# Single-proof pipeline driver, mirroring the reference's
# test/test_poseidon_plonk.sh step order: setup -> witness -> export vk ->
# generate verifier.sol -> prove (monomial + lagrange) -> verify.
# Usage: scripts/test_pipeline.sh [WORKDIR] [POWER]
set -ex

REPO="$(cd "$(dirname "$0")/.." && pwd)"
WORK="${1:-/tmp/plonkit_tpu_pipeline_test}"
POWER="${2:-10}"
CLI="python -m plonkit_tpu"
export PYTHONPATH="$REPO${PYTHONPATH:+:$PYTHONPATH}"

mkdir -p "$WORK"
cd "$WORK"

SRS="srs_2pow${POWER}.key"
if [ ! -f "$SRS" ]; then
  time $CLI setup -p "$POWER" -m "$SRS"
fi

python "$REPO/scripts/gen_inner_circuit.py" "$WORK" 1

$CLI analyse -c circuit.r1cs.json -o analyse.json
$CLI export-verification-key -m "$SRS" -c circuit.r1cs.json -v vk.bin --overwrite
$CLI generate-verifier -v vk.bin -s verifier.sol --overwrite
time $CLI prove -m "$SRS" -c circuit.r1cs.json -w witness_0.json \
    -p proof.bin -j proof.json -i public.json --overwrite
$CLI verify -p proof.bin -v vk.bin

# lagrange-form fast path must produce the identical proof
$CLI dump-lagrange -m "$SRS" -l lagrange.key -c circuit.r1cs.json --overwrite
$CLI prove -m "$SRS" -l lagrange.key -c circuit.r1cs.json -w witness_0.json \
    -p proof_l.bin -j proof_l.json -i public_l.json --overwrite
cmp proof.bin proof_l.bin

# contract execution (solvm interpreter stand-in for the hardhat step)
python "$REPO/scripts/run_contract.py" verifier.sol proof.json public.json

echo "PIPELINE OK"
