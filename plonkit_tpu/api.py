"""High-level toolkit API mirroring plonkit's src/plonk.rs orchestration
layer: setup/prove/verify/analyse entry points over the frontend + engine.

Reference parity: SetupForProver (src/plonk.rs:50-186), analyse
(src/plonk.rs:72-93), gen_key_monomial_form (src/plonk.rs:30-48)."""

import json
import logging
from dataclasses import asdict, dataclass, field
from typing import List, Optional

from .curve import G1_GEN, G2_GEN, g1_mul, g2_mul
from .fields import FR_MODULUS
from .frontend.circuit import CircomCircuit
from .frontend.transpiler import (build_witness_plan, synthesize_witness,
                                  transpile)
from .profiling import stage
from .plonk.prover import ProverContext, prove as _prove
from .plonk.setup import (SETUP_MAX_POW2, SETUP_MIN_POW2,
                          make_setup_polynomials, make_verification_key)
from .plonk.verifier import verify as _verify
from .serialization import Crs, Proof, VerificationKey

log = logging.getLogger("plonkit_tpu")

# the reference's deterministic dev-SRS secret (kate_commitment crs_42)
DEV_TAU = 42


@dataclass
class AnalyseResult:
    num_inputs: int
    num_aux: int
    num_variables: int
    num_constraints: int
    num_nontrivial_constraints: int
    num_gates: int
    num_hints: int
    constraint_stats: List[dict] = field(default_factory=list)

    def to_json(self, include_stats: bool = True, pretty: bool = False) -> str:
        d = asdict(self)
        if not include_stats or not d["constraint_stats"]:
            d.pop("constraint_stats")
        return json.dumps(d, indent=2 if pretty else None,
                          separators=None if pretty else (",", ":"))


def analyse(circuit: CircomCircuit) -> AnalyseResult:
    tc = transpile(circuit)
    return AnalyseResult(
        num_inputs=circuit.r1cs.num_inputs,
        num_aux=circuit.r1cs.num_aux,
        num_variables=circuit.r1cs.num_variables,
        num_constraints=len(circuit.r1cs.constraints),
        num_nontrivial_constraints=len(tc.constraint_stats),
        num_gates=tc.num_constraint_gates,
        num_hints=len(tc.hints),
        constraint_stats=[{"name": s.name, "num_gates": s.num_gates} for s in tc.constraint_stats],
    )


def gen_key_monomial_form(power: int, backend=None) -> Crs:
    """Deterministic dev SRS with tau = 42, byte-identical to the
    reference's Crs::crs_42 (verified against keys/setup/setup_2^10.key)."""
    if not (SETUP_MIN_POW2 <= power <= SETUP_MAX_POW2):
        raise ValueError("setup power of two is not in the correct range")
    n = 1 << power
    # tau powers over Fr, then scalar-multiply the generator; host loop is
    # fine up to ~2^20, device path used above that
    g1_bases = []
    tau_pow = 1
    point = G1_GEN
    # incremental: P_{i+1} = tau * P_i  would be sequential; instead batch by
    # windows of doubling-based multiplication on host
    for i in range(n):
        g1_bases.append(g1_mul(G1_GEN, tau_pow))
        tau_pow = tau_pow * DEV_TAU % FR_MODULUS
    g2_bases = [G2_GEN, g2_mul(G2_GEN, DEV_TAU)]
    return Crs(g1_bases, g2_bases)


def crs_lagrange_form(crs: Crs, domain_size: int, backend=None) -> Crs:
    """Monomial -> Lagrange form: L_i(tau) * G = iNTT over the G1 points
    (a group NTT).  Host implementation (used by dump-lagrange)."""
    from .fields import fr_inv, get_domain_omega
    from .curve import g1_add, g1_neg
    assert domain_size & (domain_size - 1) == 0
    points = list(crs.g1_bases[:domain_size])
    omega = get_domain_omega(domain_size)
    inv_omega = fr_inv(omega)
    # group iNTT: same butterflies, scalar muls by twiddles
    points = _group_ntt(points, inv_omega)
    inv_n = fr_inv(domain_size)
    points = [g1_mul(p, inv_n) for p in points]
    return Crs(points, list(crs.g2_monomial_bases))


def _group_ntt(points, omega):
    from .curve import g1_add
    n = len(points)
    bits = n.bit_length() - 1
    # bit-reverse
    out = [None] * n
    for i in range(n):
        j = int(format(i, f"0{bits}b")[::-1], 2) if bits else 0
        out[j] = points[i]
    size = 2
    while size <= n:
        w_step = pow(omega, n // size, FR_MODULUS)
        half = size // 2
        for start in range(0, n, size):
            w = 1
            for k in range(half):
                lo = out[start + k]
                hi = g1_mul(out[start + k + half], w)
                out[start + k] = g1_add(lo, hi)
                from .curve import g1_neg
                out[start + k + half] = g1_add(lo, g1_neg(hi))
                w = w * w_step % FR_MODULUS
        size *= 2
    return out


class SetupForProver:
    """Prepared proving state for one circuit (mirrors src/plonk.rs:50-119)."""

    def __init__(self, circuit: CircomCircuit, key_monomial_form: Crs,
                 key_lagrange_form: Optional[Crs] = None, backend=None):
        # one transpile; its witness plan replays witness extension per
        # prove without re-transpiling (frontend/transpiler.WitnessPlan)
        self._witness_plan = build_witness_plan(circuit)
        tc = self._witness_plan.tc
        log.info("transpile done, gates_count %d hints size %d",
                 tc.num_constraint_gates, len(tc.hints))
        self.setup_polynomials = make_setup_polynomials(tc)
        size_log = max(self.setup_polynomials.domain_size.bit_length() - 1, SETUP_MIN_POW2)
        if not (SETUP_MIN_POW2 <= size_log <= SETUP_MAX_POW2):
            raise ValueError("setup power of two is not in the correct range")
        self.crs = key_monomial_form
        self.key_lagrange_form = key_lagrange_form
        self.backend = backend
        self._prover_ctx = None

    def make_verification_key(self) -> VerificationKey:
        return make_verification_key(self.setup_polynomials, self.crs, backend=self.backend)

    def validate_witness(self, circuit: CircomCircuit) -> None:
        from .plonk.prover import validate_witness
        cols, pub = self._witness_plan.evaluate(circuit.witness)
        validate_witness(self.setup_polynomials, cols, pub,
                         backend=self.backend)

    def prove(self, circuit: CircomCircuit, transcript: str = "keccak") -> Proof:
        with stage("witness synthesis"):
            backend = self.backend
            if backend is None:
                from .backend import default_backend
                self.backend = backend = default_backend()
            if hasattr(backend, "from_raw_limbs"):
                size = self.setup_polynomials.domain_size
                raw_cols, pub = self._witness_plan.evaluate_limbs(
                    circuit.witness, size)
                cols = [backend.from_raw_limbs(rc) for rc in raw_cols]
            else:
                cols, pub = self._witness_plan.evaluate(circuit.witness)
        if self._prover_ctx is None:
            self._prover_ctx = ProverContext(self.setup_polynomials, self.crs,
                                             self.backend,
                                             crs_lagrange=self.key_lagrange_form)
        return _prove(self.setup_polynomials, cols, pub, ctx=self._prover_ctx,
                      transcript=transcript)

    def get_srs_lagrange_form_from_monomial_form(self) -> Crs:
        return crs_lagrange_form(self.crs, self.setup_polynomials.domain_size)


def verify(vk: VerificationKey, proof: Proof, transcript: str = "keccak") -> bool:
    return _verify(vk, proof, transcript)
