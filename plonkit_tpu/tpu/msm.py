"""Pippenger multi-scalar multiplication on TPU (SURVEY §7 step 3, hot
kernel #1; reference behavior: bellman_ce multiexp, SURVEY D1c).

TPU has no efficient random-access scatter, so classic per-bucket
accumulation is reformulated so that **no scatter ever happens**:

  1. signed c-bit digit decomposition (host numpy or on-device);
  2. ONE batched sort of all windows' |digit| keys ([W, n], XLA sort along
     the n axis) — a batched sort costs ~1/5 of W sequential sorts.  The
     sort payload packs the point index and the digit's sign into one
     uint32 (index | sign << 31), so no later per-slot index/sign gathers
     are needed;
  3. per window, a TWO-PHASE gather (XLA's gather is row-latency-bound at
     ~32 ns/row on 256 B rows regardless of width, so the scattered pass
     must touch each point exactly once and everything else must ride
     contiguous rows):
       a. phase a: one scattered row gather of the [n8, 64]-u32 point row
          table (x | y | -y | inf, 256 B rows) into sorted order, folding
          the digit sign by selecting y vs -y (column select, no field
          negation) -> a [n8, 40]-u32 "sorted rows" array;
       b. phase b: an 8-point-ALIGNED block gather (rows of 8 consecutive
          sorted points; each lane's run [start, start+count) is covered
          by blocks floor(start/8)..., so slot r of lane l holds sorted
          position (start//8)*8 + r and validity is the pure arithmetic
          (start mod 8) <= r < (start mod 8) + count — computed in-kernel
          from two scalars per lane, no index gather);
  4. **one bucket per vector lane**: lane b owns exactly bucket b; a
     fori_loop of batched *unchecked* mixed-adds (11 field muls, no
     doubling fallback — impossible for distinct SRS bases, flagged on
     device regardless) accumulates the lane's run.  The loop-carried
     accumulator IS the bucket table: no flush, no scatter.
  5. the top window's digits span only 2^(255 mod c) values, so its
     buckets are *replicated* over `repl` sub-lanes (points of one bucket
     are split round-robin across sub-lanes by within-run rank) and the
     sub-lanes are tree-folded afterwards — this keeps the sequential
     depth r_max uniform across windows;
  6. weighted bucket reduction sum(b * S_b) via two Hillis-Steele passes
     (suffix scan + prefix reduction) of batched unchecked Jacobian adds;
  7. windows combined on device (batched doubling + tree fold kernel).

Lane padding r_max is intentionally tight — mean + 5*sqrt(mean) + 8
(P[lane overflow] ~ 3e-7 per lane for uniform scalars; a 2^20 MSM retries
~2% of the time).  Overflow is *checked on device* and retried with a
conservative config (mean + 8*sqrt(mean) + 64, < 2^-40 per lane) before
falling back to the native C++ / host MSM.  Degenerate unchecked adds
(structured scalar vectors, e.g. 0/1 selector polynomials that concentrate
thousands of points in one bucket) also flag on device and go straight to
the host path (correctness first — those commitments happen once per
setup, not per proof).
"""

import math
from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

from ..fields import FR_MODULUS
from . import ec, mont
from .mont import FQ, NLIMBS

# point row table / sorted-row widths (u32 columns)
ROW_W = 64          # x(16) | y(16) | -y(16) | inf(1) | pad -> 256 B rows
DATA_W = 40         # x(16) | y_eff(16) | inf(1) | pad (post sign-fold)
INF_COL = 48

# transpose the phase-b blocks inside the sweep kernel (VMEM) instead of as
# an XLA HBM transpose (msm_pallas.sweep_tk).  Measured SLOWER on v5e
# (1.75s vs 1.65s full 2^20 MSM — Mosaic's (lb,8,40)->(40,8,lb) transpose
# costs more than XLA's); kept switchable for other chip generations.
import os as _os
TRANSPOSE_IN_KERNEL = _os.environ.get("PLONKIT_TPU_MSM_TK", "0") != "0"


def build_row_table(x, y, inf):
    """[n8, 64] u32 point row table: x | y | -y | inf flag (256 B rows).

    The scattered phase-a gather is row-latency-bound (~32 ns per 256 B
    row vs ~57 ns per 128 B row, measured), so one padded wide row beats
    two narrow per-coordinate gathers, and carrying -y turns the
    per-window sign fold into a column select instead of a field
    negation.  Rows are padded to a multiple of 8 so the aligned block
    gather (phase b) can view the table as [n8/8, 8*W] blocks."""
    n = x.shape[1]
    n8 = _round_up(n, 8)
    ny = mont.neg(FQ, y)
    tbl = jnp.concatenate([
        jnp.transpose(x), jnp.transpose(y), jnp.transpose(ny),
        inf.astype(jnp.uint32)[:, None],
        jnp.zeros((n, ROW_W - INF_COL - 1), dtype=jnp.uint32),
    ], axis=1)
    if n8 > n:
        pad = jnp.zeros((n8 - n, ROW_W), dtype=jnp.uint32)
        pad = pad.at[:, INF_COL].set(1)
        tbl = jnp.concatenate([tbl, pad], axis=0)
    return tbl


def sort_payload(digits, n):
    """uint32 sort payload: point index | digit sign << 31."""
    iota = jax.lax.broadcasted_iota(jnp.uint32, digits.shape[-1:], 0)
    sign = (digits < 0).astype(jnp.uint32) << 31
    return jnp.broadcast_to(iota, digits.shape) | sign


def signed_digits_np(scalars, c: int, num_windows: int) -> np.ndarray:
    """[num_windows, N] int32 signed digits in [-2^(c-1), 2^(c-1)]."""
    n = len(scalars)
    limbs = mont.FR.to_limbs_np(scalars).astype(np.uint64)  # [16, N] of 16-bit
    digits = np.zeros((num_windows, n), dtype=np.int64)
    for w in range(num_windows):
        bit0 = w * c
        limb0 = bit0 // 16
        off = bit0 % 16
        val = limbs[limb0] >> off
        have = 16 - off
        while have < c and limb0 + 1 < NLIMBS:
            limb0 += 1
            val = val | (limbs[limb0] << have)
            have += 16
        digits[w] = (val & ((1 << c) - 1)).astype(np.int64)
    # signed adjustment
    carry = np.zeros(n, dtype=np.int64)
    half = 1 << (c - 1)
    for w in range(num_windows):
        d = digits[w] + carry
        carry = (d > half).astype(np.int64)
        digits[w] = d - (carry << c)
    assert (carry == 0).all(), "scalar exceeded digit range"
    return digits.astype(np.int32)


def _lane_layout(keys_sorted, *, n, lanes, repl):
    """Per-lane run boundaries from one window's sorted bucket keys.

    Lane l accumulates sub-bucket l; bucket key of lane l is l // repl.
    Zero-key points (zero digits / infinity) contribute nothing and are
    excluded via the zero_end clamp.  Returns (starts, counts) [lanes]."""
    iota = jax.lax.broadcasted_iota(jnp.int32, (n,), 0)
    if repl > 1:
        # split each bucket's run over `repl` sub-lanes by within-run rank
        first = jnp.searchsorted(keys_sorted, keys_sorted, side="left").astype(jnp.int32)
        last = jnp.searchsorted(keys_sorted, keys_sorted, side="right").astype(jnp.int32)
        per = (last - first + repl - 1) // repl
        sub = (iota - first) // jnp.maximum(per, 1)
        subkeys = keys_sorted * repl + sub          # still sorted ascending
    else:
        subkeys = keys_sorted
    lane_ids = jnp.arange(lanes, dtype=jnp.int32)
    starts = jnp.searchsorted(subkeys, lane_ids, side="left").astype(jnp.int32)
    zero_end = jnp.searchsorted(keys_sorted, 1, side="left").astype(jnp.int32)
    starts = jnp.maximum(starts, zero_end)
    ends = jnp.concatenate([starts[1:], jnp.asarray([n], dtype=jnp.int32)])
    return starts, ends - starts


def _phase_a(tbl, vals_sorted):
    """Scattered row gather into sorted order + sign fold.

    tbl: [n8, 64]; vals_sorted: [n] uint32 (index | sign << 31).
    Returns [n8, DATA_W]: x | y_eff | inf, where y_eff is y or -y per the
    digit sign (a column select on the gathered row — no field math)."""
    n = vals_sorted.shape[0]
    n8 = tbl.shape[0]
    idx = (vals_sorted & jnp.uint32(0x7FFFFFFF)).astype(jnp.int32)
    g = jnp.take(tbl, idx, axis=0)                       # [n, 64]
    sign = (vals_sorted >> 31)[:, None] != 0
    y_eff = jnp.where(sign, g[:, 2 * NLIMBS:3 * NLIMBS],
                      g[:, NLIMBS:2 * NLIMBS])
    out = jnp.concatenate([
        g[:, :NLIMBS], y_eff, g[:, INF_COL:INF_COL + 1],
        jnp.zeros((n, DATA_W - 2 * NLIMBS - 1), dtype=jnp.uint32),
    ], axis=1)
    if n8 > n:
        pad = jnp.zeros((n8 - n, DATA_W), dtype=jnp.uint32)
        pad = pad.at[:, 2 * NLIMBS].set(1)               # infinity
        out = jnp.concatenate([out, pad], axis=0)
    return out


def _phase_b(sorted_rows, bstart, r_max_eff, lanes, raw_blocks=False):
    """Aligned block gather: [DATA_W, r_max_eff, lanes] padded columns
    (or the raw [RB, lanes, 8, DATA_W] blocks when raw_blocks, for the
    in-kernel-transpose sweep).

    sorted_rows: [n8, DATA_W]; bstart: [lanes] int32 = starts // 8.  Lane
    l's column holds sorted positions bstart[l]*8 .. +r_max_eff; block ids
    past the array end are clamped (those rows are invalid by count)."""
    nb = sorted_rows.shape[0] // 8
    rb = r_max_eff // 8
    blk_src = sorted_rows.reshape(nb, 8 * DATA_W)
    ids = jnp.minimum(bstart[None, :]
                      + jax.lax.broadcasted_iota(jnp.int32, (rb, 1), 0),
                      nb - 1)
    blk = jnp.take(blk_src, ids.reshape(-1), axis=0)
    blk = blk.reshape(rb, lanes, 8, DATA_W)
    if raw_blocks:
        return blk
    return jnp.transpose(blk, (3, 0, 2, 1)).reshape(DATA_W, r_max_eff, lanes)


def _sweep_jnp(data, meta):
    """jnp bucket accumulation (CPU fallback for msm_pallas.sweep):
    fori_loop of batched unchecked mixed-adds; the loop-carried accumulator
    is the bucket table.  data: [DATA_W, r_max_eff, lanes]; meta: [2,
    lanes] int32 (start mod 8, count)."""
    _, r_max_eff, lanes = data.shape
    smod = meta[0]
    cnts = meta[1]

    def body(r, carry):
        acc, bad = carry
        row = jax.lax.dynamic_index_in_dim(data, r, axis=1, keepdims=False)
        xr = row[:NLIMBS]
        yr = row[NLIMBS:2 * NLIMBS]
        valid = (r >= smod) & (r < smod + cnts)
        q_inf = ~valid | (row[2 * NLIMBS] != 0)
        acc, b = ec.add_mixed_unchecked(acc, (xr, yr, q_inf))
        return acc, bad | (b & ~q_inf)[None].astype(jnp.uint32)

    bad0 = jnp.zeros((1, lanes), dtype=jnp.uint32)
    (bx, by, bz), bad = jax.lax.fori_loop(0, r_max_eff, body,
                                          (ec.infinity(lanes), bad0))
    return bx, by, bz, bad


def _fold_jnp(pts, badvec, mask_u32, shift):
    """jnp fallback for msm_pallas.fold_round."""
    mask = mask_u32 != 0
    qx = jnp.roll(pts[0], -shift, axis=1)
    qy = jnp.roll(pts[1], -shift, axis=1)
    qz = jnp.where(mask, jnp.roll(pts[2], -shift, axis=1), 0)
    res, b = ec.add_unchecked(pts, (qx, qy, qz))
    return res, badvec | b[None].astype(jnp.uint32)


def _window_buckets(tbl, keys_sorted, vals_sorted, *, n, lanes, r_max,
                    repl, num_buckets, use_pallas, interpret=False):
    """One window's bucket table from presorted (key, index|sign) pairs:
    two-phase gather -> sweep.  Returns (bx, by, bz [16, lanes], badvec
    [1, lanes] u32, overflow)."""
    from . import msm_pallas

    starts, counts = _lane_layout(keys_sorted, n=n, lanes=lanes, repl=repl)
    bstart = starts // 8
    smod = starts % 8
    r_max_eff = r_max + 8          # alignment slop: runs start mid-block
    overflow = jnp.max(smod + counts) > r_max_eff
    counts = jnp.minimum(counts, r_max_eff - smod)
    sorted_rows = _phase_a(tbl, vals_sorted)
    meta = jnp.stack([smod, counts])

    if use_pallas:
        if TRANSPOSE_IN_KERNEL:
            blk4 = _phase_b(sorted_rows, bstart, r_max_eff, lanes,
                            raw_blocks=True)
            bx, by, bz, badvec = msm_pallas.sweep_tk(blk4, meta,
                                                     interpret=interpret)
        else:
            data = _phase_b(sorted_rows, bstart, r_max_eff, lanes)
            bx, by, bz, badvec = msm_pallas.sweep(data, meta,
                                                  interpret=interpret)
    else:
        data = _phase_b(sorted_rows, bstart, r_max_eff, lanes)
        bx, by, bz, badvec = _sweep_jnp(data, meta)
    return bx, by, bz, badvec, overflow


def _reduce_windows(pts, badvec, *, lanes, repl, num_buckets, fold):
    """Weighted bucket reduction sum_b b*S_b for nwin windows laid side by
    side: pts [16, nwin*lanes] x3 (each window one contiguous lane block,
    identical bucket layout).  Rolls cross block boundaries only into
    masked-off columns, so the nwin reductions are independent.  Batched
    so one set of Hillis-Steele rounds serves every window (the
    per-window variant cost ~26 tiny kernel dispatches x W).

    Returns (totals [16, nwin] x3, badvec)."""
    total_lanes = pts[0].shape[1]
    cols = (jnp.arange(total_lanes, dtype=jnp.int32) % lanes)[None, :]
    nbr = num_buckets * repl

    # sub-lane tree fold (top window): lane = bucket*repl + sub
    step = repl
    while step > 1:
        h = step // 2
        mask = ((cols % repl) < h).astype(jnp.uint32)
        pts, badvec = fold(pts, badvec, mask, h)
        step = h

    # keep only bucket representatives (sub == 0), drop bucket 0 and the
    # out-of-range tail; vacated columns become infinity (z = 0)
    keep = (cols % repl == 0) & (cols >= repl) & (cols < nbr)
    pts = (pts[0], pts[1], jnp.where(keep, pts[2], 0))

    # suffix scan + prefix total, both as Hillis-Steele rounds of masked
    # roll-adds (shift in units of repl)
    rounds = max(1, (num_buckets - 1).bit_length())
    for i in range(rounds):
        d = 1 << i
        mask = (cols < (num_buckets - d) * repl).astype(jnp.uint32)
        pts, badvec = fold(pts, badvec, mask, d * repl)
    # pts[:, w*lanes + b*repl] = sum_{k>=b} S_k; shift one bucket, total
    shift_mask = cols < (num_buckets - 1) * repl
    pts = tuple(jnp.where(shift_mask, jnp.roll(a, -repl, axis=1), 0) for a in pts)
    for i in range(rounds):
        d = 1 << i
        mask = (cols < (num_buckets - d) * repl).astype(jnp.uint32)
        pts, badvec = fold(pts, badvec, mask, d * repl)

    totals = tuple(a[:, ::lanes] for a in pts)
    return totals, badvec


def _get_fold(use_pallas, interpret):
    from . import msm_pallas
    if use_pallas:
        return partial(msm_pallas.fold_round, interpret=interpret)
    return _fold_jnp


def _window_from_sorted(tbl, keys_sorted, vals_sorted, *, n, lanes, r_max,
                        repl, num_buckets, use_pallas, interpret=False):
    """One Pippenger window from presorted (key, index|sign) pairs:
    two-phase gather -> sweep -> sub-lane fold -> weighted bucket
    reduction.  Returns (Jacobian total [16, 1] x3, overflow, bad)."""
    bx, by, bz, badvec, overflow = _window_buckets(
        tbl, keys_sorted, vals_sorted, n=n, lanes=lanes, r_max=r_max,
        repl=repl, num_buckets=num_buckets, use_pallas=use_pallas,
        interpret=interpret)
    totals, badvec = _reduce_windows(
        (bx, by, bz), badvec, lanes=lanes, repl=repl,
        num_buckets=num_buckets, fold=_get_fold(use_pallas, interpret))
    bad = jnp.any(badvec != 0)
    return totals + (overflow, bad)


def _window_kernel(x, y, inf, digits, *, n, lanes, r_max, repl, num_buckets):
    """One window from raw digits (sorts internally) — jnp sweep path.
    Kept for direct kernel tests and the sharded per-device MSM; the fused
    MSM uses the batched sort + a prebuilt row table."""
    tbl = build_row_table(x, y, inf)
    keys = jnp.where(inf, 0, jnp.abs(digits))
    keys_sorted, vals_sorted = jax.lax.sort_key_val(
        keys, sort_payload(digits, n))
    return _window_from_sorted(tbl, keys_sorted, vals_sorted, n=n,
                               lanes=lanes, r_max=r_max, repl=repl,
                               num_buckets=num_buckets, use_pallas=False)


def _window_pallas(x, y, inf, digits, *, n, lanes, r_max, repl, num_buckets,
                   interpret=False):
    """One window from raw digits (sorts internally) — pallas sweep path."""
    tbl = build_row_table(x, y, inf)
    keys = jnp.where(inf, 0, jnp.abs(digits))
    keys_sorted, vals_sorted = jax.lax.sort_key_val(
        keys, sort_payload(digits, n))
    return _window_from_sorted(tbl, keys_sorted, vals_sorted, n=n,
                               lanes=lanes, r_max=r_max, repl=repl,
                               num_buckets=num_buckets, use_pallas=True,
                               interpret=interpret)


def _digits_body(raw, c: int, num_windows: int):
    """Device-side signed digit decomposition from [16, N] canonical 16-bit
    limbs (mirror of signed_digits_np): keeps MSM inputs on device so
    repeated commitments never round-trip through python ints."""
    half = 1 << (c - 1)
    digs = []
    for w in range(num_windows):
        bit0 = w * c
        limb0 = bit0 // 16
        off = bit0 % 16
        val = raw[limb0] >> off
        have = 16 - off
        lidx = limb0 + 1
        while have < c and lidx < NLIMBS:
            val = val | (raw[lidx] << have)
            have += 16
            lidx += 1
        digs.append((val & ((1 << c) - 1)).astype(jnp.int32))
    digits = jnp.stack(digs)

    def body(w, st):
        carry, out = st
        d = digits[w] + carry
        new_carry = (d > half).astype(jnp.int32)
        d = d - (new_carry << c)
        return new_carry, out.at[w].set(d)

    carry = jnp.zeros((digits.shape[1],), jnp.int32)
    out = jnp.zeros_like(digits)
    _, out = jax.lax.fori_loop(0, num_windows, body, (carry, out))
    return out


def _combine_body(wx, wy, wz, W: int, c: int):
    """Window combine: result = sum_w 2^(c*w) * W_w via Horner from the top
    window (c doublings + one complete add per window), on [W, 16, 1]
    Jacobian stacks."""
    def body(i, acc):
        acc = jax.lax.fori_loop(0, c, lambda _, p: ec.double(p), acc)
        w = W - 2 - i
        return ec.add(acc, (wx[w], wy[w], wz[w]))
    return jax.lax.fori_loop(0, W - 1, body, (wx[W - 1], wy[W - 1], wz[W - 1]))


def _msm_from_digits(tbl, inf, digits, *, n, lanes, c, W, uni, top,
                     use_pallas=False):
    """Full MSM from a [W, n] digit matrix: one batched sort, all windows,
    device combine.  Returns (result, overflow, bad) — overflow means a
    lane run exceeded r_max (retry with a roomier config); bad means a
    degenerate unchecked add fired (host fallback).

    lax.map (sequential scan, body compiled once) rather than vmap over the
    uniform windows: each window already saturates the VPU (lanes x 16 limbs
    wide), the batched lowering of the padded gather miscompiles on TPU
    (observed: identical batch rows producing different results), and the
    scanned form keeps only one window's gathered data live in HBM."""
    keys = jnp.where(inf[None], 0, jnp.abs(digits))            # [W, n]
    keys_sorted, vals_sorted = jax.lax.sort_key_val(
        keys, sort_payload(digits, n), dimension=1)

    uni_fn = partial(_window_buckets, n=n, lanes=lanes, r_max=uni["r_max"],
                     repl=1, num_buckets=uni["num_buckets"],
                     use_pallas=use_pallas)
    top_fn = partial(_window_from_sorted, n=n, lanes=lanes, r_max=top["r_max"],
                     repl=top["repl"], num_buckets=top["num_buckets"],
                     use_pallas=use_pallas)
    # uniform windows: per-window bucket tables (lax.map), then ONE batched
    # reduction over all windows side by side
    bxs, bys, bzs, bads, ovfs = jax.lax.map(
        lambda a: uni_fn(tbl, *a),
        (keys_sorted[:W - 1], vals_sorted[:W - 1]))
    cat = lambda a: jnp.transpose(a, (1, 0, 2)).reshape(NLIMBS, (W - 1) * lanes)
    totals, badcat = _reduce_windows(
        (cat(bxs), cat(bys), cat(bzs)),
        jnp.transpose(bads, (1, 0, 2)).reshape(1, (W - 1) * lanes),
        lanes=lanes, repl=1, num_buckets=uni["num_buckets"],
        fold=_get_fold(use_pallas, False))
    ovf = ovfs
    bad = jnp.any(badcat != 0)
    # [16, W-1] -> [W-1, 16, 1]
    tx, ty, tz = (jnp.transpose(a, (1, 0))[:, :, None] for a in totals)
    hx, hy, hz, hovf, hbad = top_fn(tbl, keys_sorted[W - 1],
                                    vals_sorted[W - 1])
    wx = jnp.concatenate([tx, hx[None]], axis=0)
    wy = jnp.concatenate([ty, hy[None]], axis=0)
    wz = jnp.concatenate([tz, hz[None]], axis=0)
    if use_pallas:
        from . import msm_pallas
        res = msm_pallas.combine(wx, wy, wz, W, c)
    else:
        res = _combine_body(wx, wy, wz, W, c)
    return res, jnp.any(ovf) | hovf, jnp.any(bad) | hbad


@lru_cache(maxsize=None)
def _msm_digits_jit(n, lanes, c, W, uni_key, top_key, use_pallas):
    """One-dispatch MSM from host-computed digits (msm() path)."""
    fn = partial(_msm_from_digits, n=n, lanes=lanes, c=c, W=W,
                 uni=dict(uni_key), top=dict(top_key), use_pallas=use_pallas)
    return jax.jit(fn)


@lru_cache(maxsize=None)
def _msm_vec_jit(n, n_in, lanes, c, W, uni_key, top_key, use_pallas):
    """One-dispatch MSM from device Montgomery Fr limbs: from-Montgomery,
    digit decomposition, all windows, and the window combine fused into a
    single compiled program (per-op dispatch through the remote-TPU tunnel
    costs ~10ms; the eager variant spent seconds on it per MSM)."""
    def run(tbl, inf, v_mont):
        raw = mont.from_mont(mont.FR, v_mont)
        if n_in < n:
            raw = jnp.pad(raw, ((0, 0), (0, n - n_in)))
        digits = _digits_body(raw, c, W)
        return _msm_from_digits(tbl, inf, digits, n=n, lanes=lanes, c=c,
                                W=W, uni=dict(uni_key), top=dict(top_key),
                                use_pallas=use_pallas)
    return jax.jit(run)


def _round_up(v, m):
    return -(-v // m) * m


class MSMContext:
    """Device-resident prepared bases for repeated MSMs over one SRS."""

    def __init__(self, points, c: int = 13, lanes: int = None):
        self.host_points = list(points)
        self.host_points_loader = None
        self.n = len(points)
        x, y, inf = ec.affine_from_host(points)
        self._init_params(x, y, inf, c, lanes)

    @classmethod
    def from_device_affine(cls, x, y, inf, c: int = 13, lanes: int = None,
                           host_points_loader=None):
        ctx = cls.__new__(cls)
        ctx.host_points = None
        ctx.host_points_loader = host_points_loader
        ctx.n = x.shape[1]
        ctx._init_params(x, y, inf, c, lanes)
        return ctx

    def _init_params(self, x, y, inf, c, lanes):
        self.c = c
        # 255 bits: top window must absorb the signed-digit carry
        self.num_windows = -(-255 // c)
        self.tbl = jax.jit(build_row_table)(x, y, inf)
        self.inf = inf
        half = 1 << (c - 1)
        nk_uniform = half + 1                       # bucket keys 0..2^(c-1)
        if lanes is None:
            lanes = _round_up(nk_uniform, 128)
        lanes = max(lanes, nk_uniform)
        self.lanes = lanes

        def rmax_tight(mean):
            # P[Binomial(n, 1/buckets) > mean + 5 sqrt(mean)] ~ 3e-7 per
            # lane: a 2^20 MSM (84K lanes) retries ~2% of the time
            mean = max(1, mean)
            return _round_up(mean + 5 * math.isqrt(mean) + 8, 8)

        def rmax_safe(mean):
            # < 2^-40 per lane — overflow here means adversarial structure
            mean = max(1, mean)
            return _round_up(mean + 8 * math.isqrt(mean) + 64, 8)

        # uniform windows: one bucket per lane
        mean_uni = -(-self.n // max(1, nk_uniform - 1))
        self.uni = dict(repl=1, num_buckets=nk_uniform,
                        r_max=rmax_tight(mean_uni))
        self.uni_safe = dict(self.uni, r_max=rmax_safe(mean_uni))
        # top window: scalars are < FR_MODULUS, so the top digit is bounded by
        # the *modulus'* top bits (plus the signed-digit carry), NOT by the
        # full 2^(255 mod c) window range -- e.g. for c=13 only keys 0..97
        # ever occur.  Sizing r_max from the occupied span (not the window
        # range) is what keeps uniform scalars from overflowing the lanes.
        max_key = min(half, (FR_MODULUS >> ((self.num_windows - 1) * c)) + 1)
        key_hi = max_key + 1                       # bucket keys 0..max_key
        repl = 1
        while repl * 2 * key_hi <= lanes and repl < 64:
            repl *= 2
        mean_top = -(-self.n // max(1, max_key * repl))
        self.top = dict(repl=repl, num_buckets=key_hi,
                        r_max=rmax_tight(mean_top))
        self.top_safe = dict(self.top, r_max=rmax_safe(mean_top))
        # hashable configs for the lru_cached jit factories
        self._uni_key = tuple(sorted(self.uni.items()))
        self._top_key = tuple(sorted(self.top.items()))
        self._uni_safe_key = tuple(sorted(self.uni_safe.items()))
        self._top_safe_key = tuple(sorted(self.top_safe.items()))
        # VMEM-resident pallas sweep on TPU; jnp accumulation on CPU (Mosaic
        # kernels don't run there and interpret mode is orders slower)
        from . import pallas_kernels as pk
        self._use_pallas = not pk._use_jnp_fallback()

    def msm(self, scalars) -> "host affine point":
        """scalars: list of python ints (len <= n). Returns host affine point."""
        scalars = [s % FR_MODULUS for s in scalars]
        if len(scalars) < self.n:
            scalars = scalars + [0] * (self.n - len(scalars))
        digits = jnp.asarray(signed_digits_np(scalars, self.c,
                                              self.num_windows))

        def run(uni_key, top_key):
            fn = _msm_digits_jit(self.n, self.lanes, self.c, self.num_windows,
                                 uni_key, top_key, self._use_pallas)
            return fn(self.tbl, self.inf, digits)

        return self._finish(run, lambda: scalars)

    def msm_vec(self, v_mont) -> "host affine point":
        """v_mont: [16, N] device Montgomery Fr limbs (N <= n).  One fused
        dispatch: digits are extracted on device, no python-int round trip."""
        def run(uni_key, top_key):
            fn = _msm_vec_jit(self.n, v_mont.shape[1], self.lanes, self.c,
                              self.num_windows, uni_key, top_key,
                              self._use_pallas)
            return fn(self.tbl, self.inf, v_mont)

        def fallback_scalars():
            return mont.FR.from_mont_np(np.asarray(v_mont)) + \
                [0] * (self.n - v_mont.shape[1])

        return self._finish(run, fallback_scalars)

    def _host_fallback(self, fallback_scalars):
        from ..curve import g1_msm_host
        if self.host_points is None and self.host_points_loader is not None:
            self.host_points = list(self.host_points_loader())[:self.n]
        if self.host_points is None:
            raise RuntimeError(
                "MSM lane overflow and no host fallback points available")
        scalars = fallback_scalars()
        from ..native import msm_native
        res = msm_native(self.host_points, scalars)
        if res is not False:
            return res
        return g1_msm_host(self.host_points, scalars)

    def _finish(self, run, fallback_scalars):
        res, ovf, bad = run(self._uni_key, self._top_key)
        ovf_np, bad_np, res_np = jax.device_get((ovf, bad, res))
        if bool(ovf_np) and not bool(bad_np):
            # a lane run exceeded the tight r_max (~2% of uniform 2^20
            # MSMs): retry on device with the conservative padding
            res, ovf, bad = run(self._uni_safe_key, self._top_safe_key)
            ovf_np, bad_np, res_np = jax.device_get((ovf, bad, res))
        if bool(ovf_np) or bool(bad_np):
            # degenerate add or adversarial bucket skew (structured scalar
            # vectors) — fall back to host (correctness first)
            return self._host_fallback(fallback_scalars)
        return ec.to_affine_host(res_np)[0]
