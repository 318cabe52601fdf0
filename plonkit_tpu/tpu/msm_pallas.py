"""Pallas TPU kernels for the MSM bucket accumulation (hot kernel #1).

The jnp window kernel leaves the ~700-vector-op mixed-add graph to XLA,
which does not fuse it (same failure as pallas_kernels.py documents for
mont_mul): every accumulation round spilled hundreds of [16, lanes]
intermediates to HBM, making the sweep bandwidth-bound at ~60x below VPU
speed.  These kernels keep the bucket accumulator resident in VMEM across
all r_max rounds, so each round costs one block read and pure VPU compute.

Two kernels:

  * `sweep` -- grid (lane_blocks, row_blocks), rows innermost: the
    loop-carried Jacobian accumulator (= the bucket table) lives in VMEM
    scratch per lane block; slot validity is computed in-kernel from two
    per-lane scalars (start mod 8, count — see msm.py phase b), and the
    digit sign was folded during the phase-a row gather.  The lane axis is
    blocked because Mosaic stack-allocates the unrolled mixed-add
    temporaries (full-width blocks measured 34.6 MiB > the 16 MiB VMEM
    budget).
  * `padd` -- elementwise unchecked Jacobian add of two point vectors,
    lane-tiled.  The bucket-reduction rolls/masks happen in XLA (pure data
    movement), so ONE kernel variant serves the sub-lane fold and both
    Hillis-Steele passes at every shift.

Both reuse ec.py's Jacobian formulas verbatim (jnp ops lower to Mosaic
inside the kernel), so correctness is inherited from the host-oracle
tests.  CPU fallback: callers keep the jnp path (see tpu/msm.py)."""

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import ec
from .mont import NLIMBS

# rows of the padded gather consumed per grid step; r_max is rounded to a
# multiple of 8 by the caller, and Mosaic requires the block's
# second-to-last dim to be a multiple of 8
R_BLK = 8

_KERNEL_CACHE = {}


def _lane_block(lanes: int, cap: int = 512) -> int:
    """Largest divisor of `lanes` that is a multiple of 128 and <= cap."""
    best = 0
    d = 128
    while d <= min(lanes, cap):
        if lanes % d == 0:
            best = d
        d += 128
    return best or lanes


def _sweep_body(r_steps, data_ref, meta_ref, ox_ref, oy_ref,
                oz_ref, bad_ref, accx, accy, accz, badacc):
    rb = pl.program_id(1)

    @pl.when(rb == 0)
    def _():
        accx[...] = jnp.zeros_like(accx)
        accy[...] = jnp.zeros_like(accy)
        accz[...] = jnp.zeros_like(accz)   # z == 0 encodes infinity
        badacc[...] = jnp.zeros_like(badacc)

    smod = meta_ref[0, :]                  # [lb] start mod 8
    cnts = meta_ref[1, :]                  # [lb] run length
    acc = (accx[...], accy[...], accz[...])
    bad = badacc[...]
    for j in range(R_BLK):
        r = rb * R_BLK + j
        x2 = data_ref[0:NLIMBS, j, :]
        y2 = data_ref[NLIMBS:2 * NLIMBS, j, :]
        p_inf = data_ref[2 * NLIMBS, j, :] != 0
        # validity from arithmetic: lane l's run occupies rows
        # smod[l] .. smod[l] + cnts[l] of its (8-aligned) slot column
        valid = (r >= smod) & (r < smod + cnts)
        q_inf = ~valid | p_inf
        acc, b = ec.add_mixed_unchecked(acc, (x2, y2, q_inf))
        bad = bad | (b & ~q_inf)[None].astype(jnp.uint32)
    accx[...], accy[...], accz[...] = acc
    badacc[...] = bad

    @pl.when(rb == r_steps - 1)
    def _():
        ox_ref[...] = accx[...]
        oy_ref[...] = accy[...]
        oz_ref[...] = accz[...]
        bad_ref[...] = badacc[...]


def sweep(data, meta, *, interpret=False):
    """data: [DATA_W, r_max_eff, lanes] gathered rows (x | y_eff | inf, see
    msm._phase_b); meta: [2, lanes] int32 (start mod 8, count).
    Returns bucket table (x, y, z) each [16, lanes] + bad [1, lanes] u32."""
    data_w, r_max_eff, lanes = data.shape
    assert r_max_eff % R_BLK == 0, r_max_eff
    r_steps = r_max_eff // R_BLK
    lb = _lane_block(lanes)
    key = ("sweep", data_w, r_max_eff, lanes, lb, interpret)
    fn = _KERNEL_CACHE.get(key)
    if fn is None:
        coord = jax.ShapeDtypeStruct((NLIMBS, lanes), jnp.uint32)
        fn = jax.jit(pl.pallas_call(
            partial(_sweep_body, r_steps),
            grid=(lanes // lb, r_steps),
            in_specs=[
                pl.BlockSpec((data_w, R_BLK, lb), lambda l, r: (0, r, l)),
                pl.BlockSpec((2, lb), lambda l, r: (0, l)),
            ],
            out_specs=[
                pl.BlockSpec((NLIMBS, lb), lambda l, r: (0, l)),
                pl.BlockSpec((NLIMBS, lb), lambda l, r: (0, l)),
                pl.BlockSpec((NLIMBS, lb), lambda l, r: (0, l)),
                pl.BlockSpec((1, lb), lambda l, r: (0, l)),
            ],
            out_shape=[coord, coord, coord,
                       jax.ShapeDtypeStruct((1, lanes), jnp.uint32)],
            scratch_shapes=[
                pltpu.VMEM((NLIMBS, lb), jnp.uint32),
                pltpu.VMEM((NLIMBS, lb), jnp.uint32),
                pltpu.VMEM((NLIMBS, lb), jnp.uint32),
                pltpu.VMEM((1, lb), jnp.uint32),
            ],
            interpret=interpret,
        ))
        _KERNEL_CACHE[key] = fn
    return fn(data, meta)


def _sweep_body_tk(r_steps, data_ref, meta_ref, ox_ref, oy_ref,
                   oz_ref, bad_ref, accx, accy, accz, badacc):
    """Sweep over UNtransposed phase-b blocks [1, lb, 8, DATA_W]: the
    point-major -> limb-major transpose happens here in VMEM (the XLA
    transpose of the full [DATA_W, r_max, lanes] array was HBM-bound)."""
    rb = pl.program_id(1)

    @pl.when(rb == 0)
    def _():
        accx[...] = jnp.zeros_like(accx)
        accy[...] = jnp.zeros_like(accy)
        accz[...] = jnp.zeros_like(accz)
        badacc[...] = jnp.zeros_like(badacc)

    smod = meta_ref[0, :]
    cnts = meta_ref[1, :]
    blk = data_ref[0]                       # [lb, 8, DATA_W]
    arr = jnp.transpose(blk, (2, 1, 0))     # [DATA_W, 8, lb]
    acc = (accx[...], accy[...], accz[...])
    bad = badacc[...]
    for j in range(R_BLK):
        r = rb * R_BLK + j
        x2 = arr[0:NLIMBS, j, :]
        y2 = arr[NLIMBS:2 * NLIMBS, j, :]
        p_inf = arr[2 * NLIMBS, j, :] != 0
        valid = (r >= smod) & (r < smod + cnts)
        q_inf = ~valid | p_inf
        acc, b = ec.add_mixed_unchecked(acc, (x2, y2, q_inf))
        bad = bad | (b & ~q_inf)[None].astype(jnp.uint32)
    accx[...], accy[...], accz[...] = acc
    badacc[...] = bad

    @pl.when(rb == r_steps - 1)
    def _():
        ox_ref[...] = accx[...]
        oy_ref[...] = accy[...]
        oz_ref[...] = accz[...]
        bad_ref[...] = badacc[...]


def sweep_tk(blk4, meta, *, interpret=False):
    """Like `sweep` but takes the phase-b gather output in its native
    [RB, lanes, 8, DATA_W] layout and transposes per-block in VMEM."""
    rb_n, lanes, eight, data_w = blk4.shape
    assert eight == R_BLK
    lb = _lane_block(lanes)
    key = ("sweep_tk", data_w, rb_n, lanes, lb, interpret)
    fn = _KERNEL_CACHE.get(key)
    if fn is None:
        coord = jax.ShapeDtypeStruct((NLIMBS, lanes), jnp.uint32)
        fn = jax.jit(pl.pallas_call(
            partial(_sweep_body_tk, rb_n),
            grid=(lanes // lb, rb_n),
            in_specs=[
                pl.BlockSpec((1, lb, R_BLK, data_w),
                             lambda l, r: (r, l, 0, 0)),
                pl.BlockSpec((2, lb), lambda l, r: (0, l)),
            ],
            out_specs=[
                pl.BlockSpec((NLIMBS, lb), lambda l, r: (0, l)),
                pl.BlockSpec((NLIMBS, lb), lambda l, r: (0, l)),
                pl.BlockSpec((NLIMBS, lb), lambda l, r: (0, l)),
                pl.BlockSpec((1, lb), lambda l, r: (0, l)),
            ],
            out_shape=[coord, coord, coord,
                       jax.ShapeDtypeStruct((1, lanes), jnp.uint32)],
            scratch_shapes=[
                pltpu.VMEM((NLIMBS, lb), jnp.uint32),
                pltpu.VMEM((NLIMBS, lb), jnp.uint32),
                pltpu.VMEM((NLIMBS, lb), jnp.uint32),
                pltpu.VMEM((1, lb), jnp.uint32),
            ],
            interpret=interpret,
        ))
        _KERNEL_CACHE[key] = fn
    return fn(blk4, meta)


def _padd_body(px_ref, py_ref, pz_ref, qx_ref, qy_ref, qz_ref, bad_ref,
               ox_ref, oy_ref, oz_ref, obad_ref):
    p = (px_ref[...], py_ref[...], pz_ref[...])
    q = (qx_ref[...], qy_ref[...], qz_ref[...])
    res, b = ec.add_unchecked(p, q)
    ox_ref[...], oy_ref[...], oz_ref[...] = res
    # infinity partners take the select path and never flag, so masked-out
    # columns (qz forced 0 by the caller) contribute no false positives
    obad_ref[...] = bad_ref[...] | b[None].astype(jnp.uint32)


def padd(pts, q, badvec, *, interpret=False):
    """Unchecked Jacobian add of point vectors pts + q (each 3x[16, lanes]),
    accumulating degenerate-add flags into badvec [1, lanes] u32."""
    lanes = pts[0].shape[1]
    lb = _lane_block(lanes)
    key = ("padd", lanes, lb, interpret)
    fn = _KERNEL_CACHE.get(key)
    if fn is None:
        coord = jax.ShapeDtypeStruct((NLIMBS, lanes), jnp.uint32)
        flag = jax.ShapeDtypeStruct((1, lanes), jnp.uint32)
        cspec = pl.BlockSpec((NLIMBS, lb), lambda l: (0, l))
        fspec = pl.BlockSpec((1, lb), lambda l: (0, l))
        fn = jax.jit(pl.pallas_call(
            _padd_body,
            grid=(lanes // lb,),
            in_specs=[cspec, cspec, cspec, cspec, cspec, cspec, fspec],
            out_specs=[cspec, cspec, cspec, fspec],
            out_shape=[coord, coord, coord, flag],
            interpret=interpret,
        ))
        _KERNEL_CACHE[key] = fn
    ox, oy, oz, ob = fn(pts[0], pts[1], pts[2], q[0], q[1], q[2], badvec)
    return (ox, oy, oz), ob


def fold_round(pts, badvec, mask_u32, shift, *, interpret=False):
    """One masked roll-and-add round: pts[:, c] += pts[:, c+shift] where
    mask[c] != 0 (inactive partners add as infinity).  The roll and mask are
    XLA data movement; the add is the lane-tiled `padd` kernel."""
    mask = mask_u32 != 0
    qx = jnp.roll(pts[0], -shift, axis=1)
    qy = jnp.roll(pts[1], -shift, axis=1)
    qz = jnp.where(mask, jnp.roll(pts[2], -shift, axis=1), 0)
    return padd(pts, (qx, qy, qz), badvec, interpret=interpret)


def _combine_body(W, c, px_ref, py_ref, pz_ref, ox_ref, oy_ref, oz_ref):
    """result = sum_w 2^(c*w) * P[:, w], P in columns 0..W-1 (cols >= W are
    infinity).  Parallel formulation: batched doubling schedule (column w
    doubles c*w times) then a 5-round tree fold -- ~250 batched point ops in
    VMEM instead of ~250 sequential tiny XLA kernels."""
    p = (px_ref[...], py_ref[...], pz_ref[...])
    # 2D iota (1D iota is rejected by Mosaic), squeezed to the column axis
    cols = jax.lax.broadcasted_iota(jnp.int32, (1, p[0].shape[1]), 1)[0]

    def dbl_step(k, pts):
        d = ec.double(pts)
        return ec.select(k < c * cols, d, pts)

    p = jax.lax.fori_loop(0, c * (W - 1), dbl_step, p)
    # tree fold over the (padded-to-128) column axis; wrap-around columns
    # never feed columns < W because W + sum(h) < width - max(h)
    for h in (16, 8, 4, 2, 1):
        q = tuple(jnp.roll(a, -h, axis=1) for a in p)
        p = ec.add(p, q)
    ox_ref[...], oy_ref[...], oz_ref[...] = p


def combine(wx, wy, wz, W, c, *, interpret=False):
    """Device window combine on [W, 16, 1] Jacobian stacks -> [16, 1]."""
    assert W <= 100  # fold schedule assumes W + 31 < 128 - 16
    width = 128
    px = jnp.pad(jnp.transpose(wx[:, :, 0], (1, 0)), ((0, 0), (0, width - W)))
    py = jnp.pad(jnp.transpose(wy[:, :, 0], (1, 0)), ((0, 0), (0, width - W)))
    pz = jnp.pad(jnp.transpose(wz[:, :, 0], (1, 0)), ((0, 0), (0, width - W)))
    key = ("combine", W, c, interpret)
    fn = _KERNEL_CACHE.get(key)
    if fn is None:
        coord = jax.ShapeDtypeStruct((NLIMBS, width), jnp.uint32)
        spec = pl.BlockSpec((NLIMBS, width), lambda: (0, 0))
        fn = jax.jit(pl.pallas_call(
            partial(_combine_body, W, c),
            in_specs=[spec, spec, spec],
            out_specs=[spec, spec, spec],
            out_shape=[coord, coord, coord],
            interpret=interpret,
        ))
        _KERNEL_CACHE[key] = fn
    ox, oy, oz = fn(px, py, pz)
    return (ox[:, :1], oy[:, :1], oz[:, :1])
