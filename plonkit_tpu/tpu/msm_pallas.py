"""Pallas TPU kernels for the MSM bucket accumulation (hot kernel #1).

The jnp window kernel leaves the ~700-vector-op mixed-add graph to XLA,
which does not fuse it (same failure as pallas_kernels.py documents for
mont_mul): every accumulation round spilled hundreds of [16, lanes]
intermediates to HBM, making the sweep bandwidth-bound at ~60x below VPU
speed.  These kernels keep the bucket accumulator resident in VMEM across
all r_max rounds, so each round costs one block read and pure VPU compute.

Round-4 layout: the point table is u16-PACKED — one point = 16 u32 words
(x limbs 2c|2c+1 in word c's lo|hi 16 bits, words 0-7; y in words 8-15;
the infinity flag rides bit 31 of word 15, free because p < 2^254).  A
block-transposed 8-point block is 16*8 = 128 u32 = one 128-lane tile, so
the phase-a row gather moves exactly 64 B/point — the fastest XLA take
shape measured on v5e (6.4 ns/row; 256 B rows cost 13.8 ns, and the
pre-round-4 table was 256 B rows half of which was padding).  Digits are
UNSIGNED (tpu/msm.py round-4 design), so the sweep has no negation path.

Kernels:

  * `sweep_flat` -- grid (lane_blocks, row_blocks): the loop-carried
    Jacobian accumulator (= the bucket table) lives in VMEM scratch per
    lane block in ec_flat's flat-limb layout (limb i of the batch in its
    own 8-sublane vreg slice; measured 0.46 ns/(mul*elem) vs ~5 ns for
    the planar row-sliced layout).  Slot validity is computed in-kernel
    from two per-lane scalars (start mod 8, count — see msm.py phase b).
  * `padd` -- elementwise unchecked Jacobian add of two point vectors,
    lane-tiled.  The bucket-reduction rolls/masks happen in XLA (pure
    data movement), so ONE kernel variant serves the sub-lane fold and
    both Hillis-Steele passes at every shift.
  * `combine` -- window combine (batched doubling + tree fold).

All reuse ec.py / ec_flat.py Jacobian formulas verbatim (jnp ops lower to
Mosaic inside the kernel), so correctness is inherited from the
host-oracle tests.  CPU fallback: callers keep the jnp path (tpu/msm.py).

Reference behavior: bellman_ce multiexp (SURVEY D1c)."""

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import ec, ec_flat
from .mont import NLIMBS

# u32 words per packed point (x|y, 16-bit limb pairs); an 8-point
# block-transposed row is PACK_W*8 = 128 u32 = one 128-lane tile
PACK_W = 16
MASK16 = 0xFFFF

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


def _unpack_block(t):
    """[128, lb] block-transposed packed rows -> (x, y limb lists, q_inf).

    Row c*8 + j of t holds packed word c of the block's j-th point, so the
    8-sublane slice t[8c:8c+8] is word c across the 8 sub-points; limbs
    2c / 2c+1 are its lo/hi 16 bits.  The infinity flag is bit 31 of word
    15 (p < 2^254 leaves the top two bits of limb 15 free)."""
    words = [t[8 * c:8 * (c + 1), :] for c in range(PACK_W)]
    x2 = []
    y2 = []
    for c in range(8):
        x2.append(words[c] & MASK16)
        x2.append(words[c] >> 16)
    for c in range(8, 15):
        y2.append(words[c] & MASK16)
        y2.append(words[c] >> 16)
    y2.append(words[15] & MASK16)
    top = words[15] >> 16
    q_inf = (top >> 15) != 0
    y2.append(top & 0x3FFF)
    return x2, y2, q_inf


def _sweep_flat_body(r_steps, data_ref, meta_ref, ox_ref, oy_ref, oz_ref,
                     bad_ref, accx, accy, accz, badacc):
    """Flat-limb bucket sweep with j-sublane sub-accumulators.

    data block [1, 1, lb, 128]: lb lanes x one block-transposed packed
    8-point block.  The 8 points land on 8 sublanes: sublane s accumulates
    the lane's points with within-block offset s — ONE batched mixed-add
    per grid step covers 8 points/lane at full VPU width with no data
    relayout (the [lb, 128] -> [128, lb] transpose is VMEM-local).
    Sub-accumulators fold 8 -> 1 in-kernel at the last step.
    meta block [1, 2, lb] int32 (start mod 8, count)."""
    rb = pl.program_id(1)

    @pl.when(rb == 0)
    def _():
        accx[...] = jnp.zeros_like(accx)
        accy[...] = jnp.zeros_like(accy)
        accz[...] = jnp.zeros_like(accz)
        badacc[...] = jnp.zeros_like(badacc)

    lb = accx.shape[1]
    t = jnp.transpose(data_ref[0, 0])            # [128, lb], rows c*8 + j
    smod = meta_ref[0, 0, :]
    cnts = meta_ref[0, 1, :]
    jidx = jax.lax.broadcasted_iota(jnp.int32, (8, lb), 0)
    r_point = rb * 8 + jidx
    valid = (r_point >= smod[None]) & (r_point < smod[None] + cnts[None])

    x2, y2, p_inf = _unpack_block(t)
    q_inf = ~valid | p_inf

    ax = [accx[8 * i:8 * (i + 1), :] for i in range(NLIMBS)]
    ay = [accy[8 * i:8 * (i + 1), :] for i in range(NLIMBS)]
    az = [accz[8 * i:8 * (i + 1), :] for i in range(NLIMBS)]
    (ax, ay, az), b = ec_flat.add_mixed_unchecked((ax, ay, az), x2, y2, q_inf)
    for i in range(NLIMBS):
        accx[8 * i:8 * (i + 1), :] = ax[i]
        accy[8 * i:8 * (i + 1), :] = ay[i]
        accz[8 * i:8 * (i + 1), :] = az[i]
    badacc[...] = badacc[...] | jnp.where(b & ~q_inf, jnp.uint32(1),
                                          jnp.uint32(0))

    @pl.when(rb == r_steps - 1)
    def _():
        # fold the 8 sub-accumulators per lane (tree over the sublane axis);
        # masked-off partners enter as infinity and the add's select path
        # passes the accumulator through unflagged
        sub = jax.lax.broadcasted_iota(jnp.int32, (8, lb), 0)
        for h in (4, 2, 1):
            ax = [accx[8 * i:8 * (i + 1), :] for i in range(NLIMBS)]
            ay = [accy[8 * i:8 * (i + 1), :] for i in range(NLIMBS)]
            az = [accz[8 * i:8 * (i + 1), :] for i in range(NLIMBS)]
            mask = sub < h
            qx = [pltpu.roll(v, 8 - h, axis=0) for v in ax]
            qy = [pltpu.roll(v, 8 - h, axis=0) for v in ay]
            qz = [jnp.where(mask, pltpu.roll(v, 8 - h, axis=0), 0)
                  for v in az]
            (ax, ay, az), b = ec_flat.add_unchecked((ax, ay, az),
                                                    (qx, qy, qz))
            for i in range(NLIMBS):
                accx[8 * i:8 * (i + 1), :] = ax[i]
                accy[8 * i:8 * (i + 1), :] = ay[i]
                accz[8 * i:8 * (i + 1), :] = az[i]
            badacc[...] = badacc[...] | jnp.where(
                b, jnp.uint32(1), jnp.uint32(0))
        bad8 = badacc[...]
        bad = bad8[0:1] | bad8[1:2] | bad8[2:3] | bad8[3:4] | \
            bad8[4:5] | bad8[5:6] | bad8[6:7] | bad8[7:8]
        for i in range(NLIMBS):
            ox_ref[0, i:i + 1, :] = accx[8 * i:8 * i + 1, :]
            oy_ref[0, i:i + 1, :] = accy[8 * i:8 * i + 1, :]
            oz_ref[0, i:i + 1, :] = accz[8 * i:8 * i + 1, :]
        bad_ref[0, 0:1, :] = bad


def sweep_flat(data, meta_flat, *, interpret=False):
    """Flat-limb sweep over packed rows.  data: [r_steps, nblk, lb, 128]
    block-transposed packed 8-point blocks (msm._phase_b_flat); meta_flat:
    [nblk, 2, lb] int32.  Returns (x, y, z [nblk, 16, lb] u32, bad
    [nblk, 1, lb]); planar [16, lanes] is one small transpose away
    (lane = blk*lb + col)."""
    r_steps, nblk, lb, cols = data.shape
    assert cols == PACK_W * 8
    key = ("sweep_flat", r_steps, nblk, lb, interpret)
    fn = _KERNEL_CACHE.get(key)
    if fn is None:
        coord = jax.ShapeDtypeStruct((nblk, NLIMBS, lb), jnp.uint32)
        cspec = pl.BlockSpec((1, NLIMBS, lb), lambda b, r: (b, 0, 0))
        fn = jax.jit(pl.pallas_call(
            partial(_sweep_flat_body, r_steps),
            grid=(nblk, r_steps),
            in_specs=[
                pl.BlockSpec((1, 1, lb, cols), lambda b, r: (r, b, 0, 0)),
                pl.BlockSpec((1, 2, lb), lambda b, r: (b, 0, 0)),
            ],
            out_specs=[cspec, cspec, cspec,
                       pl.BlockSpec((1, 1, lb), lambda b, r: (b, 0, 0))],
            out_shape=[coord, coord, coord,
                       jax.ShapeDtypeStruct((nblk, 1, lb), jnp.uint32)],
            scratch_shapes=[
                pltpu.VMEM((NLIMBS * 8, lb), jnp.uint32),
                pltpu.VMEM((NLIMBS * 8, lb), jnp.uint32),
                pltpu.VMEM((NLIMBS * 8, lb), jnp.uint32),
                pltpu.VMEM((8, lb), jnp.uint32),
            ],
            interpret=interpret,
        ))
        _KERNEL_CACHE[key] = fn
    return fn(data, meta_flat)


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
