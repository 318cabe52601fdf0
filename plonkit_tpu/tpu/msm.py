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
  3. per window, a TWO-PHASE gather (XLA's gather moves ~13 GB/s
     regardless of row width — row-latency/issue-bound — so the scattered
     pass must touch each point exactly once, with the SLIMMEST possible
     rows, and everything else must ride contiguous rows):
       a. phase a: one scattered row gather of the [n8, 36]-u32 point row
          table (x | y | inf, 144 B rows) into sorted order, tagging the
          digit sign into the flag column (bit 1) — the negation itself
          happens inside the sweep kernel (16 cheap vector ops) instead of
          paying 64 gathered bytes for a precomputed -y;
       b. phase b: an 8-point-ALIGNED block gather (rows of 8 consecutive
          sorted points; each lane's run [start, start+count) is covered
          by blocks floor(start/8)..., so slot r of lane l holds sorted
          position (start//8)*8 + r and validity is the pure arithmetic
          (start mod 8) <= r < (start mod 8) + count — computed in-kernel
          from two scalars per lane, no index gather);
  4. **one bucket per vector lane**, with lane l owning bucket key
     (l // repl) + 1 (keys are 1-based: zero digits sort first and fall
     outside every lane's run, so no zero-bucket clamp is needed, and
     lanes = 2^(c-1) exactly — a power of two, which the flat-limb kernel
     layout requires).  The sweep kernel (msm_pallas.sweep_flat) keeps
     limb i of every coordinate in its own 8-sublane vreg slice ("flat
     limbs", ec_flat.py) so each unchecked mixed-add (11 field muls) runs
     at full VPU width — measured 0.46 ns/(mul*elem) vs ~5 ns for the
     planar row-sliced layout.  The loop-carried accumulator IS the bucket
     table: no flush, no scatter;
  5. the top window's digits span only the modulus' top bits, so its
     buckets are *replicated* over `repl` sub-lanes (points of one bucket
     are split round-robin across sub-lanes by within-run rank), keeping
     the sequential depth r_max uniform across windows;
  6. weighted bucket reduction sum_k k*S_k as ONE VMEM-resident kernel per
     window (msm_pallas.reduce_weighted): sub-lane tree fold + inclusive
     suffix sums + tree total (sum over representatives of inclusive
     suffix sums = sum_k k*S_k given the 1-based keys) — ~29 in-VMEM
     rounds replacing 26 all-window HBM Hillis-Steele passes that
     measured ~440 ms of the 2^20 MSM;
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

# point row table: [n8, 64] u32, 256 B rows — x(16) | y(16) | 32 pad.
# XLA's scattered row gather is erratically width-sensitive on v5e
# (measured ns/row: 6.4 @ 64 B single-stream, 37 @ 128 B, 45 @ 144 B,
# 14 @ 256 B, 11.5 @ 512 B; two 64 B gathers in ONE program degrade to
# ~30 ms, interleaved 2n x 64 B to ~49 ms), so one padded 256 B-row
# gather is the fastest realizable phase-a shape even though half the
# bytes are padding.  The infinity flag (bit 16) and the digit sign
# (bit 17, added in phase a) ride the free high bits of y limb 15.
ROW_W = 64
DATA_W = 32         # meaningful columns (x | y)
FLAG_LIMB = 31      # column carrying the packed flags

import os as _os

# flat sweep lane-block width (lanes per kernel block)
LB = int(_os.environ.get("PLONKIT_TPU_MSM_LB", "512"))


def build_row_table(x, y, inf):
    """[n8, 64] u32 point row table (x | y | pad); infinity flag packed
    into y limb 15's bit 16.  Rows are padded to a multiple of 8 so the
    aligned block gather (phase b) can view the table as 8-point blocks."""
    n = x.shape[1]
    n8 = _round_up(n, 8)
    ytop = y[NLIMBS - 1] | (inf.astype(jnp.uint32) << 16)
    tbl = jnp.concatenate([
        jnp.transpose(x), jnp.transpose(y[:NLIMBS - 1]), ytop[:, None],
        jnp.zeros((n, ROW_W - DATA_W), dtype=jnp.uint32),
    ], axis=1)
    if n8 > n:
        pad = jnp.zeros((n8 - n, ROW_W), dtype=jnp.uint32)
        pad = pad.at[:, FLAG_LIMB].set(1 << 16)
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

    Lane l accumulates sub-bucket l + repl, i.e. bucket key l//repl + 1
    (1-based keys: zero-key points — zero digits / infinity — sort before
    every lane's range and are excluded with no clamp).  Returns
    (starts, counts) [lanes]."""
    iota = jax.lax.broadcasted_iota(jnp.int32, (n,), 0)
    if repl > 1:
        # split each bucket's run over `repl` sub-lanes by within-run rank.
        # Run boundaries come from prefix/suffix scans over the sorted keys
        # (searchsorted(keys, keys) lowered to ~20 serial 1M-row gather
        # passes — measured ~350 ms for the top window alone).
        starts_mask = jnp.concatenate(
            [jnp.ones((1,), bool), keys_sorted[1:] != keys_sorted[:-1]])
        ends_mask = jnp.concatenate(
            [keys_sorted[1:] != keys_sorted[:-1], jnp.ones((1,), bool)])
        first = jax.lax.associative_scan(
            jnp.maximum, jnp.where(starts_mask, iota, 0))
        last = jax.lax.associative_scan(
            jnp.minimum, jnp.where(ends_mask, iota + 1, n), reverse=True)
        per = (last - first + repl - 1) // repl
        sub = (iota - first) // jnp.maximum(per, 1)
        subkeys = keys_sorted.astype(jnp.int32) * repl + sub
    else:
        subkeys = keys_sorted
    lane_ids = jnp.arange(lanes, dtype=jnp.int32) + repl
    starts = jnp.searchsorted(subkeys, lane_ids, side="left").astype(jnp.int32)
    ends = jnp.concatenate([starts[1:], jnp.asarray([n], dtype=jnp.int32)])
    return starts, ends - starts


def _phase_a(tbl, vals_sorted):
    """Scattered row gather into sorted order + sign tag.

    tbl: [n8, 64]; vals_sorted: [n] uint32 (index | sign << 31).  Returns
    [n8, 32] (x | y, padding dropped) with the digit sign at y-limb-15
    bit 17 (negation happens inside the sweep kernel)."""
    n = vals_sorted.shape[0]
    n8 = tbl.shape[0]
    idx = (vals_sorted & jnp.uint32(0x7FFFFFFF)).astype(jnp.int32)
    g = jnp.take(tbl, idx, axis=0)                       # [n, 64]
    sign = (vals_sorted >> 31).astype(jnp.uint32)
    flagged = g[:, FLAG_LIMB] | (sign << 17)
    out = jnp.concatenate([g[:, :FLAG_LIMB], flagged[:, None]], axis=1)
    if n8 > n:
        pad = jnp.zeros((n8 - n, DATA_W), dtype=jnp.uint32)
        pad = pad.at[:, FLAG_LIMB].set(1 << 16)        # infinity
        out = jnp.concatenate([out, pad], axis=0)
    return out


def _phase_b(sorted_rows, bstart, r_max_eff, lanes):
    """Aligned block gather -> [DATA_W, r_max_eff, lanes] padded columns
    (planar layout, jnp sweep path): rows 0-15 x limbs, 16-31 y limbs
    (flags packed in y limb 15).

    bstart: [lanes] int32 = starts // 8.  Lane l's column holds sorted
    positions bstart[l]*8 .. +r_max_eff; block ids past the array end are
    clamped (those rows are invalid by count)."""
    nb = sorted_rows.shape[0] // 8
    rb = r_max_eff // 8
    blk_src = sorted_rows.reshape(nb, 8 * DATA_W)
    ids = jnp.minimum(bstart[None, :]
                      + jax.lax.broadcasted_iota(jnp.int32, (rb, 1), 0),
                      nb - 1)
    blk = jnp.take(blk_src, ids.reshape(-1), axis=0)
    blk = blk.reshape(rb, lanes, 8, DATA_W)
    return jnp.transpose(blk, (3, 0, 2, 1)).reshape(DATA_W, r_max_eff, lanes)


def _phase_b_flat(sorted_rows, bstart, r_max_eff, lanes, lb):
    """Aligned block gather for sweep_flat: [r_steps, nblk, lb, 256].

    The 8-point blocks of sorted_rows are transposed ONCE at n-scale
    ([nb, 8, 32] -> [nb, 32, 8], so a gathered block row reads limb-major:
    transposed-row index i*8 + j); the r_max-padded gather output then
    needs NO further relayout — a per-window 6-D transpose of the padded
    gather measured ~27 ms/window."""
    nb = sorted_rows.shape[0] // 8
    rb = r_max_eff // 8
    nblk = lanes // lb
    sr2 = sorted_rows.reshape(nb, 8, DATA_W).transpose(0, 2, 1) \
                     .reshape(nb, DATA_W * 8)
    ids = jnp.minimum(bstart[None, :]
                      + jax.lax.broadcasted_iota(jnp.int32, (rb, 1), 0),
                      nb - 1).reshape(-1)
    blk = jnp.take(sr2, ids, axis=0)                     # [rb*lanes, 256]
    return blk.reshape(rb, nblk, lb, DATA_W * 8)


def _meta_flat(smod, cnts, lanes, lb):
    """[2, lanes] int32 -> [nblk, 2, lb]."""
    nblk = lanes // lb
    meta = jnp.stack([smod, cnts])
    return meta.reshape(2, nblk, lb).transpose(1, 0, 2)


def _sweep_jnp(data, meta):
    """jnp bucket accumulation (CPU fallback for msm_pallas.sweep_flat):
    fori_loop of batched unchecked mixed-adds; the loop-carried accumulator
    is the bucket table.  data: [ROW_W, r_max_eff, lanes] (planar phase_b);
    meta: [2, lanes] int32 (start mod 8, count)."""
    _, r_max_eff, lanes = data.shape
    smod = meta[0]
    cnts = meta[1]

    def body(r, carry):
        acc, bad = carry
        row = jax.lax.dynamic_index_in_dim(data, r, axis=1, keepdims=False)
        xr = row[:NLIMBS]
        ytop = row[2 * NLIMBS - 1]
        flag = ytop >> 16
        yr = jnp.concatenate([row[NLIMBS:2 * NLIMBS - 1],
                              (ytop & 0xFFFF)[None]], axis=0)
        valid = (r >= smod) & (r < smod + cnts)
        q_inf = ~valid | ((flag & 1) != 0)
        sign = (flag & 2) != 0
        yr = mont.select(sign, mont.neg(FQ, yr), yr)
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
    qz = jnp.where(mask[None], jnp.roll(pts[2], -shift, axis=1), 0)
    res, b = ec.add_unchecked(pts, (qx, qy, qz))
    return res, badvec | b[None].astype(jnp.uint32)


def _get_fold(use_pallas, interpret):
    from . import msm_pallas
    if use_pallas:
        return partial(msm_pallas.fold_round, interpret=interpret)
    return _fold_jnp


def _reduce_weighted(pts, badvec, *, lanes, repl, fold):
    """Weighted bucket reduction sum_k k*S_k for G windows laid side by
    side: pts [16, G*lanes] x3 (each window one contiguous lane block,
    identical layout; lane l holds sub-bucket l + repl, i.e. 1-based
    bucket keys — msm._lane_layout's one-key shift).

    Steps: sub-lane tree fold (repl > 1) -> inclusive suffix sums over the
    repl-strided representatives -> tree total.  Sum over representatives
    of inclusive suffix sums equals sum_j (j+1)*S_j = sum_k k*S_k, so no
    separate one-bucket shift pass is needed.  Rolls cross window block
    boundaries only into masked-off columns, and one set of rounds serves
    every window.  Each round is one lane-tiled `fold` kernel dispatch
    (an all-rounds-in-VMEM megakernel variant compiled for tens of
    minutes and overflowed the Mosaic SSA stack).

    Returns (totals [16, G] x3, badvec)."""
    total = pts[0].shape[1]
    cols = jnp.arange(total, dtype=jnp.int32) % lanes

    step = repl
    while step > 1:
        h = step // 2
        mask = ((cols % repl) < h).astype(jnp.uint32)
        pts, badvec = fold(pts, badvec, mask, h)
        step = h
    if repl > 1:
        pts = (pts[0], pts[1],
               jnp.where((cols % repl == 0)[None], pts[2], 0))
    nrep = lanes // repl
    d = 1
    while d < nrep:
        mask = (cols < (nrep - d) * repl).astype(jnp.uint32)
        pts, badvec = fold(pts, badvec, mask, d * repl)
        d *= 2
    d = nrep // 2
    while d >= 1:
        mask = (cols < d * repl).astype(jnp.uint32)
        pts, badvec = fold(pts, badvec, mask, d * repl)
        d //= 2
    totals = tuple(a[:, ::lanes] for a in pts)
    return totals, badvec


def _window_buckets(tbl, keys_sorted, vals_sorted, *, n, lanes, r_max,
                    repl, use_pallas, interpret=False):
    """One window's bucket table from presorted (key, index|sign) pairs:
    two-phase gather -> sweep.  Returns (bx, by, bz [16, lanes] planar,
    badvec [1, lanes] u32, overflow)."""
    from . import msm_pallas

    starts, counts = _lane_layout(keys_sorted, n=n, lanes=lanes, repl=repl)
    bstart = starts // 8
    smod = starts % 8
    r_max_eff = r_max + 8          # alignment slop: runs start mid-block
    overflow = jnp.max(smod + counts) > r_max_eff
    counts = jnp.minimum(counts, r_max_eff - smod)
    sorted_rows = _phase_a(tbl, vals_sorted)

    if use_pallas:
        lb = min(LB, lanes)
        data = _phase_b_flat(sorted_rows, bstart, r_max_eff, lanes, lb)
        meta = _meta_flat(smod, counts, lanes, lb)
        ox, oy, oz, ob = msm_pallas.sweep_flat(data, meta,
                                               interpret=interpret)
        bx, by, bz = (o.transpose(1, 0, 2).reshape(NLIMBS, lanes)
                      for o in (ox, oy, oz))
        badvec = ob.transpose(1, 0, 2).reshape(1, lanes)
    else:
        data = _phase_b(sorted_rows, bstart, r_max_eff, lanes)
        meta = jnp.stack([smod, counts])
        bx, by, bz, badvec = _sweep_jnp(data, meta)
    return bx, by, bz, badvec, overflow


def _window_from_sorted(tbl, keys_sorted, vals_sorted, *, n, lanes, r_max,
                        repl, use_pallas, interpret=False, num_buckets=None):
    """One Pippenger window from presorted (key, index|sign) pairs:
    two-phase gather -> sweep -> weighted bucket reduction.
    Returns (Jacobian total [16, 1] x3, overflow, bad)."""
    bx, by, bz, badvec, overflow = _window_buckets(
        tbl, keys_sorted, vals_sorted, n=n, lanes=lanes, r_max=r_max,
        repl=repl, use_pallas=use_pallas, interpret=interpret)
    totals, bad2 = _reduce_weighted(
        (bx, by, bz), badvec, lanes=lanes, repl=repl,
        fold=_get_fold(use_pallas, interpret))
    bad = jnp.any(bad2 != 0)
    return totals[0], totals[1], totals[2], overflow, bad


def _window_kernel(x, y, inf, digits, *, n, lanes, r_max, repl,
                   num_buckets=None):
    """One window from raw digits (sorts internally) — jnp sweep path.
    Kept for direct kernel tests and the sharded per-device MSM; the fused
    MSM uses the batched sort + a prebuilt row table."""
    tbl = build_row_table(x, y, inf)
    keys = jnp.where(inf, 0, jnp.abs(digits))
    keys_sorted, vals_sorted = jax.lax.sort_key_val(
        keys, sort_payload(digits, n))
    return _window_from_sorted(tbl, keys_sorted, vals_sorted, n=n,
                               lanes=lanes, r_max=r_max, repl=repl,
                               use_pallas=False)


def _window_pallas(x, y, inf, digits, *, n, lanes, r_max, repl,
                   num_buckets=None, interpret=False):
    """One window from raw digits (sorts internally) — pallas sweep path."""
    tbl = build_row_table(x, y, inf)
    keys = jnp.where(inf, 0, jnp.abs(digits))
    keys_sorted, vals_sorted = jax.lax.sort_key_val(
        keys, sort_payload(digits, n))
    return _window_from_sorted(tbl, keys_sorted, vals_sorted, n=n,
                               lanes=lanes, r_max=r_max, repl=repl,
                               use_pallas=True, interpret=interpret)


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
    uniform windows: each window already saturates the VPU, the batched
    lowering of the padded gather miscompiles on TPU (observed: identical
    batch rows producing different results), and the scanned form keeps
    only one window's gathered data live in HBM."""
    from . import msm_pallas
    keys = jnp.where(inf[None], 0, jnp.abs(digits))            # [W, n]
    keys_sorted, vals_sorted = jax.lax.sort_key_val(
        keys, sort_payload(digits, n), dimension=1)

    uni_fn = partial(_window_buckets, n=n, lanes=lanes, r_max=uni["r_max"],
                     repl=1, use_pallas=use_pallas)
    top_fn = partial(_window_from_sorted, n=n, lanes=lanes,
                     r_max=top["r_max"], repl=top["repl"],
                     use_pallas=use_pallas)
    # uniform windows: per-window bucket tables (lax.map), then ONE batched
    # weighted reduction over all windows side by side
    bxs, bys, bzs, bads, ovfs = jax.lax.map(
        lambda a: uni_fn(tbl, *a),
        (keys_sorted[:W - 1], vals_sorted[:W - 1]))
    cat = lambda a: jnp.transpose(a, (1, 0, 2)).reshape(NLIMBS, (W - 1) * lanes)
    totals, badcat = _reduce_weighted(
        (cat(bxs), cat(bys), cat(bzs)),
        jnp.transpose(bads, (1, 0, 2)).reshape(1, (W - 1) * lanes),
        lanes=lanes, repl=1, fold=_get_fold(use_pallas, False))
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
        # exactly one lane per bucket key 1..half (keys are 1-based; zero
        # digits are excluded by the sort order) — a power of two, as the
        # flat-limb sweep layout requires
        self.lanes = half if lanes is None else lanes
        assert self.lanes >= half and self.lanes % 1024 == 0, self.lanes
        lanes = self.lanes

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
        mean_uni = -(-self.n // half)
        self.uni = dict(repl=1, r_max=rmax_tight(mean_uni))
        self.uni_safe = dict(self.uni, r_max=rmax_safe(mean_uni))
        # top window: scalars are < FR_MODULUS, so the top digit is bounded by
        # the *modulus'* top bits (plus the signed-digit carry), NOT by the
        # full 2^(255 mod c) window range -- e.g. for c=13 only keys 0..97
        # ever occur.  Sizing r_max from the occupied span (not the window
        # range) is what keeps uniform scalars from overflowing the lanes.
        max_key = min(half, (FR_MODULUS >> ((self.num_windows - 1) * c)) + 1)
        key_hi = max_key + 1
        repl = 1
        while repl * 2 * key_hi <= lanes and repl < 64:
            repl *= 2
        mean_top = -(-self.n // max(1, max_key * repl))
        self.top = dict(repl=repl, r_max=rmax_tight(mean_top))
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
