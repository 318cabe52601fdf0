"""plonkit_tpu: a TPU-native PLONK proving framework.

A from-scratch reimplementation of the fluidex/plonkit toolchain (circom
R1CS -> PLONK proofs over BN254, Solidity-verifiable) with the execution
model redesigned for TPU: JAX/Pallas kernels for field arithmetic, NTT and
Pippenger MSM, jax.sharding for multi-chip scale-out.

Byte-compatible with the reference's artifact formats (.r1cs/.wtns inputs,
SRS .key, vk.bin, proof.bin, verifier.sol) -- proofs are bit-identical to
bellman_ce's (tests/test_golden.py).
"""

__version__ = "0.1.0"
