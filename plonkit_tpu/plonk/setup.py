"""PLONK setup: selector/permutation polynomial construction and
verification-key generation for the width-4 + D-next system.

Behavioral parity: bellman_ce better_cs setup/make_verification_key
(SURVEY D1g); layout conventions verified byte-exact against
test/circuits/simple/vk.bin (see frontend/transpiler.py docstring)."""

from dataclasses import dataclass
from typing import List

from ..fields import FR_MODULUS as R, NON_RESIDUES, get_domain_omega
from ..frontend.transpiler import DUMMY, STATE_WIDTH, TranspiledCircuit
from ..serialization import Crs, VerificationKey

SETUP_MIN_POW2 = 10
SETUP_MAX_POW2 = 26

# permutation coset labels: column j uses k_j * omega^i, k = [1, 5, 7, 10]
K_COLS = (1,) + NON_RESIDUES


@dataclass
class SetupPolynomials:
    """Value-form setup polynomials over the full domain (size n+1)."""
    n: int                      # usable rows = domain_size - 1
    num_inputs: int             # public input count
    selectors: List[List[int]]  # 7 vectors: q_a q_b q_c q_d q_m q_const q_dnext
    permutations: List[List[int]]  # 4 sigma value vectors

    @property
    def domain_size(self) -> int:
        return self.n + 1


def domain_size_for_gates(total_gates: int) -> int:
    """bellman keeps n = 2^k - 1 usable rows; the domain is 2^k."""
    size = 1
    while size - 1 < total_gates:
        size <<= 1
    return size


def make_setup_polynomials(tc: TranspiledCircuit) -> SetupPolynomials:
    total = tc.total_gates
    size = domain_size_for_gates(total)
    n = size - 1
    omega = get_domain_omega(size)

    selectors = [[0] * size for _ in range(7)]
    all_gates = tc.all_gates()
    for row, gate in enumerate(all_gates):
        for sel_idx, coeff in enumerate(gate.selector_row()):
            selectors[sel_idx][row] = coeff

    # copy-constraint cycles: per-variable cell lists in gate order
    # (columns a..d within each gate); dummy Aux(0) cells keep identity.
    positions = {}
    for row, gate in enumerate(all_gates):
        for col in range(STATE_WIDTH):
            var = gate.wires[col]
            if var == DUMMY:
                continue
            positions.setdefault(var, []).append((row, col))

    omega_pows = [1] * size
    for i in range(1, size):
        omega_pows[i] = omega_pows[i - 1] * omega % R

    sigma = [[K_COLS[c] * omega_pows[r] % R for r in range(size)] for c in range(STATE_WIDTH)]
    for plist in positions.values():
        if len(plist) < 2:
            continue
        labels = [K_COLS[c] * omega_pows[r] % R for (r, c) in plist]
        rotated = labels[1:] + labels[:1]
        for (r, c), lab in zip(plist, rotated):
            sigma[c][r] = lab

    return SetupPolynomials(n=n, num_inputs=tc.num_input_variables,
                            selectors=selectors, permutations=sigma)


def make_verification_key(setup: SetupPolynomials, crs: Crs, backend=None) -> VerificationKey:
    """Commit to the 11 setup polynomials over the monomial-form SRS."""
    if backend is None:
        from ..backend import default_backend
        backend = default_backend()
    size = setup.domain_size
    num_g1 = getattr(crs, "num_g1", None) or len(crs.g1_bases)
    assert num_g1 >= size, "SRS too small for circuit"
    msm_ctx = backend.msm_context_from_crs(crs, size, key=("srs", id(crs), size))

    from ..backend import from_ints_dedup

    def commit(values):
        coeffs = backend.intt(from_ints_dedup(backend, values))
        return backend.commit(msm_ctx, coeffs)

    sel_comms = [commit(setup.selectors[i]) for i in range(6)]
    next_comms = [commit(setup.selectors[6])]
    perm_comms = [commit(setup.permutations[i]) for i in range(STATE_WIDTH)]
    return VerificationKey(
        n=setup.n,
        num_inputs=setup.num_inputs,
        selector_commitments=sel_comms,
        next_step_selector_commitments=next_comms,
        permutation_commitments=perm_comms,
        non_residues=list(NON_RESIDUES),
        g2_elements=list(crs.g2_monomial_bases[:2]),
    )
