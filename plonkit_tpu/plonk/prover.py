"""PLONK prover for the width-4 + D-next system.

Behavioral parity: bellman_ce better_cs prover (prove / prove_by_steps,
SURVEY D1g).  Deterministic (no blinding) -- the reference's own bar is
byte-identical proof.bin across runs (src/tests.rs:68-72), which this
implementation meets (tests/test_golden.py).

Protocol (matches the verifier spec contrib/template.sol:309-786):
  round 1: wire polynomials a,b,c,d -- iNTT + 4 MSM commitments
  round 2: permutation grand product z(X)   (prefix scan) -- MSM commit
  round 3: quotient t(X) on a 4x coset LDE, split into 4 chunks -- 4 MSMs
  round 4: evaluations at zeta and zeta*omega; linearization r(X)
  round 5: two batched KZG opening quotients -- 2 MSMs

All O(n) math is routed through the compute backend (host ints or TPU).
"""

from dataclasses import dataclass
from typing import List, Optional, Sequence

from ..fields import FR_MODULUS as R, FR_GENERATOR, fr_inv, get_domain_omega
from ..serialization import Crs, Proof
from ..transcript import Transcript
from .setup import K_COLS, STATE_WIDTH, SetupPolynomials

LDE_FACTOR = 4


class ProvingError(Exception):
    pass


def _rotate(values: Sequence[int], k: int) -> List[int]:
    return list(values[k:]) + list(values[:k])


def _synthetic_div(coeffs: Sequence[int], point: int) -> List[int]:
    """Divide p(X) by (X - point), dropping the remainder (Ruffini)."""
    out = [0] * (len(coeffs) - 1)
    acc = 0
    for i in range(len(coeffs) - 1, 0, -1):
        acc = (acc * point + coeffs[i]) % R
        out[i - 1] = acc
    return out


def validate_witness(setup: SetupPolynomials, wire_columns: List[List[int]],
                     public_inputs: List[int]) -> None:
    """Equivalent of is_satisfied_using_one_shot_check (src/plonk.rs:127-129):
    every gate equation must hold over the trace."""
    size = setup.domain_size
    cols = [list(col) + [0] * (size - len(col)) for col in wire_columns]
    q = setup.selectors
    for row in range(size):
        d_next = cols[3][(row + 1) % size]
        pi = public_inputs[row] if row < len(public_inputs) else 0
        acc = (
            q[0][row] * cols[0][row] + q[1][row] * cols[1][row]
            + q[2][row] * cols[2][row] + q[3][row] * cols[3][row]
            + q[4][row] * cols[0][row] * cols[1][row]
            + q[5][row] + q[6][row] * d_next + pi
        ) % R
        if acc != 0:
            raise ProvingError(f"constraint system is not satisfied at row {row}")


def prove(setup: SetupPolynomials, wire_columns: List[List[int]],
          public_inputs: List[int], crs: Crs, backend=None) -> Proof:
    if backend is None:
        from ..backend import default_backend
        backend = default_backend()

    size = setup.domain_size
    n = setup.n
    omega = get_domain_omega(size)
    assert len(crs.g1_bases) >= size, "SRS too small"
    bases = crs.g1_bases[:size]

    validate_witness(setup, wire_columns, public_inputs)

    transcript = Transcript()
    for x in public_inputs:
        transcript.update_u256(x)

    # ---- round 1: wire polynomials -------------------------------------
    wires_v = [list(col) + [0] * (size - len(col)) for col in wire_columns]
    wires_m = [backend.intt(col) for col in wires_v]
    wire_comms = [backend.msm(bases, m) for m in wires_m]
    for p in wire_comms:
        transcript.update_g1(p)
    beta = transcript.get_challenge()
    gamma = transcript.get_challenge()

    # ---- round 2: grand product ----------------------------------------
    omega_pows = [1] * size
    for i in range(1, size):
        omega_pows[i] = omega_pows[i - 1] * omega % R

    num = [1] * size
    den = [1] * size
    for j in range(STATE_WIDTH):
        kj_beta = K_COLS[j] * beta % R
        wj = wires_v[j]
        sj = setup.permutations[j]
        num = backend.mul(num, [(wj[i] + kj_beta * omega_pows[i] + gamma) % R for i in range(size)])
        den = backend.mul(den, [(wj[i] + beta * sj[i] + gamma) % R for i in range(size)])
    den_inv = backend.batch_inverse(den)
    ratio = backend.mul(num, den_inv)
    z_v = backend.grand_product(ratio)
    z_m = backend.intt(z_v)
    z_comm = backend.msm(bases, z_m)
    transcript.update_g1(z_comm)
    alpha = transcript.get_challenge()

    # ---- round 3: quotient ---------------------------------------------
    ext = LDE_FACTOR * size
    shift = FR_GENERATOR

    def lde(mon):
        return backend.coset_lde(mon, LDE_FACTOR, shift)

    sel_m = [backend.intt(s) for s in setup.selectors]
    sigma_m = [backend.intt(s) for s in setup.permutations]

    wires_l = [lde(m) for m in wires_m]
    z_l = lde(z_m)
    sel_l = [lde(m) for m in sel_m]
    sigma_l = [lde(m) for m in sigma_m]

    # PI(X) = sum_i x_i L_i(X)
    pi_v = [0] * size
    for i, x in enumerate(public_inputs):
        pi_v[i] = x
    pi_l = lde(backend.intt(pi_v))

    # L_0(X)
    l0_v = [0] * size
    l0_v[0] = 1
    l0_l = lde(backend.intt(l0_v))

    # coset points: X = shift * eta^t, eta = root of the 4N domain
    eta = get_domain_omega(ext)
    x_coset = [1] * ext
    for t in range(1, ext):
        x_coset[t] = x_coset[t - 1] * eta % R
    x_coset = backend.scale(x_coset, shift)

    d_next_l = _rotate(wires_l[3], LDE_FACTOR)
    z_next_l = _rotate(z_l, LDE_FACTOR)

    # gate terms
    gate = backend.mul(sel_l[0], wires_l[0])
    gate = backend.add(gate, backend.mul(sel_l[1], wires_l[1]))
    gate = backend.add(gate, backend.mul(sel_l[2], wires_l[2]))
    gate = backend.add(gate, backend.mul(sel_l[3], wires_l[3]))
    gate = backend.add(gate, backend.mul(sel_l[4], backend.mul(wires_l[0], wires_l[1])))
    gate = backend.add(gate, sel_l[5])
    gate = backend.add(gate, backend.mul(sel_l[6], d_next_l))
    gate = backend.add(gate, pi_l)

    # permutation terms
    perm_num = z_l
    perm_den = z_next_l
    for j in range(STATE_WIDTH):
        kj_beta = K_COLS[j] * beta % R
        perm_num = backend.mul(perm_num, backend.add_scalar(
            backend.add(wires_l[j], backend.scale(x_coset, kj_beta)), gamma))
        perm_den = backend.mul(perm_den, backend.add_scalar(
            backend.add(wires_l[j], backend.scale(sigma_l[j], beta)), gamma))
    perm = backend.sub(perm_num, perm_den)

    alpha2 = alpha * alpha % R
    numerator = backend.add(gate, backend.scale(perm, alpha))
    numerator = backend.add(
        numerator,
        backend.scale(backend.mul(backend.add_scalar(z_l, R - 1), l0_l), alpha2),
    )

    # divide by Z_H on the coset: values have period LDE_FACTOR
    shift_pow = pow(shift, size, R)
    eta_pow = pow(eta, size, R)  # 4th root of unity
    van = []
    acc = shift_pow
    for _ in range(LDE_FACTOR):
        van.append((acc - 1) % R)
        acc = acc * eta_pow % R
    van_inv = backend.batch_inverse(van)
    vanishing_inv = [van_inv[t % LDE_FACTOR] for t in range(ext)]
    t_l = backend.mul(numerator, vanishing_inv)
    t_m = backend.coset_intt(t_l, shift)
    # t has degree <= 4n - 1 < 4(n+1); the top coefficients must vanish
    for c in t_m[LDE_FACTOR * size - (LDE_FACTOR - 1):]:
        if c != 0:
            raise ProvingError("quotient degree check failed (unsatisfied witness?)")

    t_chunks = [t_m[i * size:(i + 1) * size] for i in range(LDE_FACTOR)]
    t_comms = [backend.msm(bases, ch) for ch in t_chunks]
    for p in t_comms:
        transcript.update_g1(p)
    zeta = transcript.get_challenge()

    # ---- round 4: evaluations + linearization --------------------------
    zeta_omega = zeta * omega % R
    a_z, b_z, c_z, d_z = (backend.poly_eval(m, zeta) for m in wires_m)
    d_zw = backend.poly_eval(wires_m[3], zeta_omega)
    z_zw = backend.poly_eval(z_m, zeta_omega)
    sigma_z = [backend.poly_eval(sigma_m[j], zeta) for j in range(STATE_WIDTH - 1)]

    zeta_n = pow(zeta, size, R)
    t_z = 0
    power = 1
    for ch in t_chunks:
        t_z = (t_z + power * backend.poly_eval(ch, zeta)) % R
        power = power * zeta_n % R

    # L_0(zeta)
    vanishing_z = (pow(zeta, size, R) - 1) % R
    l0_z = vanishing_z * fr_inv((zeta - 1) * size % R) % R

    wire_evals = [a_z, b_z, c_z, d_z]

    # r(X) = linearization polynomial
    lin_gate_factor_z = alpha
    gp_factor = (a_z + beta * zeta + gamma) % R
    for j in range(1, STATE_WIDTH):
        gp_factor = gp_factor * ((wire_evals[j] + K_COLS[j] * beta % R * zeta + gamma) % R) % R
    z_coeff = (gp_factor * alpha + l0_z * alpha2) % R

    sigma_factor = alpha * beta % R * z_zw % R
    for j in range(STATE_WIDTH - 1):
        sigma_factor = sigma_factor * ((wire_evals[j] + beta * sigma_z[j] + gamma) % R) % R

    r_m = list(sel_m[5])
    for j in range(STATE_WIDTH):
        r_m = backend.add(r_m, backend.scale(sel_m[j], wire_evals[j]))
    r_m = backend.add(r_m, backend.scale(sel_m[4], a_z * b_z % R))
    r_m = backend.add(r_m, backend.scale(sel_m[6], d_zw))
    r_m = backend.add(r_m, backend.scale(z_m, z_coeff))
    r_m = backend.sub(r_m, backend.scale(sigma_m[STATE_WIDTH - 1], sigma_factor))
    r_z = backend.poly_eval(r_m, zeta)

    for e in wire_evals:
        transcript.update_fr(e)
    transcript.update_fr(d_zw)
    for e in sigma_z:
        transcript.update_fr(e)
    transcript.update_fr(t_z)
    transcript.update_fr(r_z)
    transcript.update_fr(z_zw)
    v = transcript.get_challenge()

    # ---- round 5: opening proofs ---------------------------------------
    # aggregate at zeta: t_agg + v*r + v^2..v^5 wires + v^6..v^8 sigmas
    t_agg = list(t_chunks[0])
    power = 1
    for ch in t_chunks[1:]:
        power = power * zeta_n % R
        t_agg = backend.add(t_agg, backend.scale(ch, power))

    agg = t_agg
    vpow = v
    agg = backend.add(agg, backend.scale(r_m, vpow))
    for m in wires_m:
        vpow = vpow * v % R
        agg = backend.add(agg, backend.scale(m, vpow))
    for j in range(STATE_WIDTH - 1):
        vpow = vpow * v % R
        agg = backend.add(agg, backend.scale(sigma_m[j], vpow))
    w_z = _synthetic_div(agg, zeta)
    opening_z = backend.msm(bases, w_z)

    v9 = pow(v, 9, R)
    agg_w = backend.add(backend.scale(z_m, v9), backend.scale(wires_m[3], v9 * v % R))
    w_zw = _synthetic_div(agg_w, zeta_omega)
    opening_zw = backend.msm(bases, w_zw)

    return Proof(
        n=n,
        num_inputs=setup.num_inputs,
        input_values=list(public_inputs),
        wire_commitments=wire_comms,
        grand_product_commitment=z_comm,
        quotient_poly_commitments=t_comms,
        wire_values_at_z=wire_evals,
        wire_values_at_z_omega=[d_zw],
        grand_product_at_z_omega=z_zw,
        quotient_polynomial_at_z=t_z,
        linearization_polynomial_at_z=r_z,
        permutation_polynomials_at_z=sigma_z,
        opening_at_z_proof=opening_z,
        opening_at_z_omega_proof=opening_zw,
    )
