"""Sharded prover step: the multi-chip composition of the prover's hot
pipeline over a 1-D device mesh (domain/"sequence" parallelism -- SURVEY
§5.7/§5.8).

One step = for domain-sharded wire polynomials:
  1. distributed iNTT (values -> monomial), Bailey 4-step w/ all-to-alls
  2. distributed 4x coset LDE (zero-pad resharded + coset twiddle + NTT)
  3. pointwise gate-constraint evaluation on the coset (local, fused limbs)
  4. permutation grand-product: local prefix scans + all_gather'd shard
     offsets (the classic distributed-scan fixup)
  5. a cross-shard field reduction of the quotient values (stand-in for the
     MSM partial combine, which rides the same collective)

This is what __graft_entry__.dryrun_multichip compiles and runs on a
virtual mesh; the math is checked against the single-device backend.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from ..fields import FR_MODULUS as R, FR_GENERATOR, fr_inv, get_domain_omega
from ..tpu import mont, ntt as tntt
from ..tpu.mont import FR, NLIMBS
from .mesh import AXIS, domain_sharding
from .ntt import distributed_intt, distributed_ntt


def _mul(a, b):
    return mont.mont_mul(FR, a, b)


def _add(a, b):
    return mont.add(FR, a, b)


def distributed_grand_product(factors, mesh):
    """Shifted prefix product of a domain-sharded [16, n] factor vector:
    out[0] = 1, out[i] = prod(factors[:i])."""
    D = mesh.devices.size

    def body(x):
        n_local = x.shape[1]
        # local shifted-prefix-product via Hillis-Steele (log rounds)
        one = jnp.asarray(FR.to_mont_np([1]))
        shifted = jnp.concatenate([jnp.broadcast_to(one, (NLIMBS, 1)), x[:, :-1]], axis=1)

        rounds = max(1, (n_local - 1).bit_length())

        def round_body(i, p):
            d = jnp.int32(1) << i
            cols = jax.lax.broadcasted_iota(jnp.int32, (n_local,), 0)
            mask = cols >= d
            rolled = jnp.roll(p, d, axis=1)
            ones = jnp.broadcast_to(one, p.shape)
            rolled = jnp.where(mask[None], rolled, ones)
            return _mul(p, rolled)

        local = jax.lax.fori_loop(0, rounds, round_body, shifted)
        # shard total = local[last] * x[last]
        total = _mul(local[:, -1:], x[:, -1:])
        # exclusive prefix of shard totals across devices
        totals = jax.lax.all_gather(total, AXIS, axis=1, tiled=True)  # [16, D]
        my = jax.lax.axis_index(AXIS)

        def off_body(i, acc):
            use = i < my
            ti = jax.lax.dynamic_slice_in_dim(totals, i, 1, axis=1)
            t = jnp.where(use, ti, jnp.broadcast_to(one, (NLIMBS, 1)))
            return _mul(acc, t)

        init = jnp.broadcast_to(one, (NLIMBS, 1))
        # the carry becomes device-varying (it depends on axis_index)
        init = jax.lax.pcast(init, (AXIS,), to="varying")
        offset = jax.lax.fori_loop(0, D, off_body, init)
        return _mul(local, jnp.broadcast_to(offset, local.shape))

    fn = jax.jit(jax.shard_map(body, mesh=mesh, in_specs=P(None, AXIS),
                               out_specs=P(None, AXIS)))
    return fn(factors)


def sharded_quotient_step(mesh, wires_v, selectors_v, pi_v, x_coset,
                          vanishing_inv, beta: int, gamma: int,
                          interpret: bool = True):
    """One sharded prover macro-step on domain-sharded inputs.

    wires_v: 4 x [16, n] wire value vectors;  selectors_v: 7 x [16, n];
    pi_v: [16, n] public-input values; x_coset, vanishing_inv: [16, 4n].
    Returns (t values [16, 4n], z values [16, n], checksum [16, 1])."""
    n = wires_v[0].shape[1]
    ext = 4 * n
    shard = domain_sharding(mesh)

    # 1. values -> monomial (distributed iNTT)
    wires_m = [distributed_intt(w, mesh, interpret=interpret) for w in wires_v]
    sel_m = [distributed_intt(s, mesh, interpret=interpret) for s in selectors_v]
    pi_m = distributed_intt(pi_v, mesh, interpret=interpret)

    # 2. coset LDE: zero-pad to 4n, coset-scale, distributed NTT
    shift_pows = jnp.asarray(tntt._powers_np(FR_GENERATOR, ext))

    def lde(m):
        padded = jnp.concatenate(
            [m, jnp.zeros((NLIMBS, ext - n), dtype=jnp.uint32)], axis=1)
        padded = jax.device_put(padded, shard)
        scaled = _coset_scale_sharded(padded, shift_pows, mesh)
        return distributed_ntt(scaled, mesh, interpret=interpret)

    wires_l = [lde(m) for m in wires_m]
    sel_l = [lde(m) for m in sel_m]
    pi_l = lde(pi_m)

    # 3. pointwise gate evaluation on the coset (local limb math).
    # fori_loop over terms: unrolled limb graphs blow up XLA-CPU compile time.
    def gate_body(sl, wl, pil):
        ab = _mul(wl[0], wl[1])
        one = jnp.broadcast_to(
            jnp.asarray(FR.one_mont_limbs[:, None], dtype=jnp.uint32), pil.shape)
        terms = jnp.concatenate([wl, ab[None], one[None]], axis=0)  # [6,16,m]

        def body(i, g):
            return _add(g, _mul(sl[i], terms[i]))

        # (q_d_next rotation is a ppermute in the full pipeline)
        return jax.lax.fori_loop(0, 6, body, pil)

    gate_fn = jax.jit(jax.shard_map(
        gate_body, mesh=mesh,
        in_specs=(P(None, None, AXIS), P(None, None, AXIS), P(None, AXIS)),
        out_specs=P(None, AXIS)))
    gate_l = gate_fn(jnp.stack(sel_l), jnp.stack(wires_l), pi_l)

    def div_body(g, vinv):
        return _mul(g, vinv)

    t_l = jax.jit(jax.shard_map(div_body, mesh=mesh,
                                in_specs=(P(None, AXIS), P(None, AXIS)),
                                out_specs=P(None, AXIS)))(gate_l, vanishing_inv)

    # 4. grand product over the (unextended) domain
    factors = jax.jit(jax.shard_map(
        lambda w, s: _add(_mul(w, s), w),  # toy copy-factor: w*(s+1)
        mesh=mesh, in_specs=(P(None, AXIS), P(None, AXIS)),
        out_specs=P(None, AXIS)))(wires_v[0], selectors_v[0])
    z_v = distributed_grand_product(factors, mesh)

    # 5. cross-shard reduction (field checksum of t; the MSM partial combine
    # rides the same all_gather collective)
    def reduce_body(t):
        n_local = t.shape[1]
        acc = t
        m = n_local
        while m > 1:
            half = m // 2
            acc = _add(acc[:, :half], acc[:, half:2 * half])
            m = half
        partials = jax.lax.all_gather(acc, AXIS, axis=1, tiled=True)  # [16, D]
        out = partials[:, :1]
        for i in range(1, partials.shape[1]):
            out = _add(out, partials[:, i:i + 1])
        return out

    checksum = jax.jit(jax.shard_map(reduce_body, mesh=mesh, in_specs=P(None, AXIS),
                                     out_specs=P(None, None), check_vma=False))(t_l)
    return t_l, z_v, checksum


def _coset_scale_sharded(x, shift_pows, mesh):
    def body(xl, pl):
        return _mul(xl, pl)
    return jax.jit(jax.shard_map(body, mesh=mesh,
                                 in_specs=(P(None, AXIS), P(None, AXIS)),
                                 out_specs=P(None, AXIS)))(
        x, jax.device_put(shift_pows, domain_sharding(mesh)))
