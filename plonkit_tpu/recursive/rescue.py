"""Rescue algebraic hash over BN254 Fr (sponge, 2-into-1), the in-circuit-
cheap hash the reference uses for its vk Merkle tree and rescue transcript
(franklin-crypto Bn256RescueParams::new_checked_2_into_1, SURVEY D2a).

Shape parity with the reference: state width 3 (rate 2 + capacity 1),
22 rounds, S-box x^5 and its inverse power.  Round constants and the MDS
matrix are generated here by a deterministic keccak-counter procedure
(seeded with a domain tag); franklin-crypto generates its constants with its
own CSPRNG procedure, so hashes are NOT bit-compatible with the reference's
rescue yet -- recovering that generation procedure is tracked follow-up
work for the recursive stack.  Everything downstream (vk tree, rescue
transcript) is parameterized over this module so swapping constants is a
one-line change.
"""

from typing import List, Sequence

from ..fields import FR_MODULUS as R
from ..keccak import keccak256

STATE_WIDTH = 3
RATE = 2
CAPACITY = 1
NUM_ROUNDS = 22
ALPHA = 5
# x^5 is a permutation of Fr since gcd(5, r-1) = 1
ALPHA_INV = pow(ALPHA, -1, R - 1)


def _field_stream(tag: bytes):
    """Deterministic Fr elements via keccak counter mode (rejection-free:
    mask to 253 bits like the transcript does)."""
    counter = 0
    while True:
        digest = keccak256(tag + counter.to_bytes(8, "big"))
        yield int.from_bytes(digest, "big") & ((1 << 253) - 1)
        counter += 1


def _generate_constants():
    stream = _field_stream(b"plonkit-tpu/rescue/round-constants/v1")
    round_constants = [
        [next(stream) for _ in range(STATE_WIDTH)] for _ in range(2 * NUM_ROUNDS + 1)
    ]
    # Cauchy MDS matrix m[i][j] = 1/(x_i - y_j) with distinct x, y
    xs = [i for i in range(STATE_WIDTH)]
    ys = [STATE_WIDTH + i for i in range(STATE_WIDTH)]
    mds = [[pow((x - y) % R, -1, R) for y in ys] for x in xs]
    return round_constants, mds


ROUND_CONSTANTS, MDS = _generate_constants()


def _mds_mul(state: List[int]) -> List[int]:
    return [sum(MDS[i][j] * state[j] for j in range(STATE_WIDTH)) % R
            for i in range(STATE_WIDTH)]


def rescue_permutation(state: Sequence[int]) -> List[int]:
    s = [x % R for x in state]
    s = [(x + c) % R for x, c in zip(s, ROUND_CONSTANTS[0])]
    for rnd in range(2 * NUM_ROUNDS):
        power = ALPHA_INV if rnd % 2 == 0 else ALPHA
        s = [pow(x, power, R) for x in s]
        s = _mds_mul(s)
        s = [(x + c) % R for x, c in zip(s, ROUND_CONSTANTS[rnd + 1])]
    return s


def rescue_hash(inputs: Sequence[int]) -> int:
    """Sponge with rate 2: absorb pairs, squeeze one element (2-into-1 for
    two inputs -- the Merkle-tree compression shape)."""
    state = [0] * STATE_WIDTH
    buf = [x % R for x in inputs]
    if len(buf) % RATE:
        buf.append(1)  # pad marker
    for i in range(0, len(buf), RATE):
        for j in range(RATE):
            state[j] = (state[j] + buf[i + j]) % R
        state = rescue_permutation(state)
    return state[0]


class RescueTranscript:
    """Algebraic Fiat-Shamir transcript (shape of franklin-crypto's
    RescueTranscriptForRNS): absorbs Fr elements and G1 points (as RNS limb
    chunks), squeezes challenges by permuting the sponge state."""

    def __init__(self):
        self.state = [0] * STATE_WIDTH
        self._absorbed: List[int] = []

    def update_fr(self, value: int):
        self._absorbed.append(value % R)

    def update_u256(self, value: int):
        # public inputs / scalars are absorbed as Fr elements
        self.update_fr(value)

    def update_g1(self, p):
        from .rns import fq_to_double_limbs
        if p is None:
            self._absorbed.extend([0, 0])
            return
        for coord in p:
            self._absorbed.extend(fq_to_double_limbs(coord))

    def _flush(self):
        buf = self._absorbed
        self._absorbed = []
        if not buf:
            return
        if len(buf) % RATE:
            buf.append(1)
        for i in range(0, len(buf), RATE):
            for j in range(RATE):
                self.state[j] = (self.state[j] + buf[i + j]) % R
            self.state = rescue_permutation(self.state)

    def get_challenge(self) -> int:
        self._flush()
        self.state = rescue_permutation(self.state)
        return self.state[0]
