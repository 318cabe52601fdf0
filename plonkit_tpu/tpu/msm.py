"""Pippenger multi-scalar multiplication on TPU (SURVEY §7 step 3, hot
kernel #1; reference behavior: bellman_ce multiexp, SURVEY D1c).

TPU has no efficient random-access scatter, so classic per-bucket
accumulation is reformulated so that **no scatter ever happens** — and
(round 4) so that the per-window scattered gather, which dominated the
round-3 profile at ~95% of wall-clock, moves the fewest possible bytes
through XLA's issue-bound row-gather path (measured on v5e: 6.4 ns/row at
64 B rows vs 13.8 ns at 256 B, regardless of bytes — the gather is
row-ISSUE bound, so the design minimizes *rows x row-bytes* jointly):

  1. **u16-packed point table** [n8, 16] u32: one point's x|y as 16 words
     (limbs 2c|2c+1 in word c's lo|hi bits) = exactly one 64 B row — the
     fastest take shape — with zero padding bytes.  The infinity flag
     rides bit 31 of word 15 (p < 2^254).
  2. **unsigned c-bit digits** (c=12): bucket key (12 bits) and point
     index (20 bits) pack into ONE u32 `key << 20 | idx`, so the batched
     all-window sort is a single-operand `lax.sort` (measured 42 ms for
     [22, 2^20] vs 87 ms for the signed design's key+payload sort +
     carry-chain digit pass), and the sweep has **no sign path at all**
     (no negation, no sign gathers; 5% fewer VPU ops per add).  The
     20-bit index bounds a chunk at 2^20 points; larger MSMs split into
     chunks whose Jacobian results are added at the end (the same
     decomposition the multi-chip shard path uses).
  3. per window: phase a = ONE fused 64 B-row take into sorted order +
     8-point block transpose ([n8,16] -> [nb, 128], one 128-lane tile per
     block); phase b = an 8-point-ALIGNED block gather of 512 B rows
     (measured 2.0 ns/row — bandwidth-class, not issue-bound); each
     lane's run [start, start+count) is covered by blocks
     floor(start/8)..., validity is pure per-lane arithmetic in-kernel.
  4. **one bucket per vector lane**, lane l owning bucket key l + 1
     (keys are 1-based: zero digits sort first and fall outside every
     lane's run, so no zero-bucket clamp is needed).  The sweep kernel
     (msm_pallas.sweep_flat) keeps limb i of every coordinate in its own
     8-sublane vreg slice ("flat limbs", ec_flat.py) so each unchecked
     mixed-add (11 field muls) runs at full VPU width — measured 0.46
     ns/(mul*elem).  The loop-carried accumulator IS the bucket table:
     no flush, no scatter;
  5. the top window's digits span only the modulus' top bits (for c=12,
     keys 0..3), so its buckets are *replicated* over `repl` sub-lanes
     (points of one bucket split round-robin across sub-lanes by
     within-run rank), keeping the sequential depth r_max uniform;
  6. weighted bucket reduction sum_k k*S_k batched across all windows
     (msm_pallas.fold_round rounds): sub-lane tree fold + inclusive
     suffix sums + tree total (sum over representatives of inclusive
     suffix sums = sum_k k*S_k given the 1-based keys);
  7. windows combined on device (batched doubling + tree fold kernel).

Why not batched-affine adds (the classic GPU trick, 6 muls + shared
inversion vs 11 Jacobian muls): Montgomery batch inversion is 3 muls/elem
only when the prefix products run SEQUENTIALLY per thread; on TPU vectors
the r-axis is the only sequential axis and the accumulator's x feeds the
next denominator, so the inversion must batch per TREE LEVEL instead —
r-extent prefix (2 muls) + cross-lane tree root + backward pass (2 muls)
= ~4 muls/elem of inversion overhead on top of the 6-mul affine add.
~10 vs 11 muls per point-slot, for a much hairier kernel: not taken.
The measured wall composition at 2^20 (525 ms total): sorted-order
gathers 8.2 ms/window (issue-bound floor), sweep 8.8 ms/window
(0.5 ns/(mul*elem), VPU-bound), digits+sort 66 ms, reduction 45 ms.

Lane padding r_max is intentionally tight — mean + 5*sqrt(mean) + 8
(P[lane overflow] ~ 3e-7 per lane for uniform scalars).  Overflow is
*checked on device* and retried with a conservative config (mean +
8*sqrt(mean) + 64, < 2^-40 per lane) before falling back to the native
C++ / host MSM.  Degenerate unchecked adds (structured scalar vectors,
e.g. 0/1 selector polynomials that concentrate thousands of points in one
bucket) also flag on device and go straight to the host path (correctness
first — those commitments happen once per setup, not per proof).
"""

import logging
import math
from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

from ..fields import FR_MODULUS
from . import ec, mont
from .mont import NLIMBS

# u32 words per packed point row (x | y as 16-bit limb pairs)
PACK_W = 16
FLAG_WORD = 15        # word carrying the infinity flag (bit 31)
IDX_BITS = 20         # index bits in the packed sort element
IDX_MASK = (1 << IDX_BITS) - 1
MAX_CHUNK = 1 << IDX_BITS

import os as _os

# flat sweep lane-block width (lanes per kernel block)
LB = int(_os.environ.get("PLONKIT_TPU_MSM_LB", "512"))

log = logging.getLogger("plonkit_tpu")


def _round_up(v, m):
    return -(-v // m) * m


def build_packed_table(x, y, inf):
    """[n8, 16] u32 packed point rows from planar [16, n] u32 limb arrays
    (Montgomery form) + [n] infinity mask.  Word c packs limbs 2c|2c+1 of
    x (c<8) or y (c>=8) as lo|hi 16 bits; the infinity flag is bit 31 of
    word 15 (y's top limb < 2^14).  Rows pad to a multiple of 8 (padding
    rows flagged infinity) so phase b can view the table as 8-point
    blocks."""
    n = x.shape[1]
    n8 = _round_up(n, 8)
    cols = [x[2 * c] | (x[2 * c + 1] << 16) for c in range(8)]
    cols += [y[2 * c] | (y[2 * c + 1] << 16) for c in range(8)]
    cols[FLAG_WORD] = cols[FLAG_WORD] | (inf.astype(jnp.uint32) << 31)
    tbl = jnp.stack(cols, axis=1)
    if n8 > n:
        pad = jnp.zeros((n8 - n, PACK_W), dtype=jnp.uint32)
        pad = pad.at[:, FLAG_WORD].set(jnp.uint32(1) << 31)
        tbl = jnp.concatenate([tbl, pad], axis=0)
    return tbl


def digits_np(scalars, c: int, num_windows: int) -> np.ndarray:
    """[num_windows, N] int32 unsigned c-bit digits (host numpy)."""
    n = len(scalars)
    limbs = mont.FR.to_limbs_np(scalars).astype(np.uint64)  # [16, N] 16-bit
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
    return digits.astype(np.int32)


def _digits_packed(raw, c: int, num_windows: int):
    """[W, N] u32 packed sort elements `digit << IDX_BITS | idx` from
    [16, N] canonical 16-bit Fr limbs, on device (no carry chain — digits
    are unsigned)."""
    n = raw.shape[1]
    assert n <= MAX_CHUNK, n
    iota = jax.lax.broadcasted_iota(jnp.uint32, (1, n), 1)[0]
    out = []
    for w in range(num_windows):
        bit0 = w * c
        limb0 = bit0 // 16
        off = bit0 % 16
        val = raw[limb0] >> off
        if off + c > 16 and limb0 + 1 < NLIMBS:
            val = val | (raw[limb0 + 1] << (16 - off))
        d = val & jnp.uint32((1 << c) - 1)
        out.append((d << IDX_BITS) | iota)
    return jnp.stack(out)


def _lane_layout(keys_sorted, *, n, lanes, repl):
    """Per-lane run boundaries from one window's sorted bucket keys.

    Lane l accumulates sub-bucket l + repl, i.e. bucket key l//repl + 1
    (1-based keys: zero-key points — zero digits — sort before every
    lane's range and are excluded with no clamp).  Returns
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
        subkeys = keys_sorted.astype(jnp.int32)
    lane_ids = jnp.arange(lanes, dtype=jnp.int32) + repl
    starts = jnp.searchsorted(subkeys, lane_ids, side="left").astype(jnp.int32)
    ends = jnp.concatenate([starts[1:], jnp.asarray([n], dtype=jnp.int32)])
    return starts, ends - starts


PA_CHUNK = 1 << 17   # phase-a gather chunk (rows): row-gathers are
#                      issue-bound ~6.6 ns/row when emitted as ONE 2^20-row
#                      take + transpose, but ~4.2 ns/row when split into
#                      2^17-row take+transpose chunks (measured on v5e,
#                      scratch/ubench_r5_gather2.py) — XLA picks a
#                      faster emitter for sub-2^18-row gathers


def _phase_a(tbl, srt, idx_bits=IDX_BITS):
    """Fused sorted-order row gather + 8-point block transpose.

    tbl: [n8, 16] packed rows; srt: [n8] u32 sorted `key<<idx_bits|idx`
    elements.  Returns [nb, 128] u32 — row b holds the b-th 8-point block
    of the sorted sequence, block-transposed so element c*8 + j is packed
    word c of sorted point 8b + j (one row = one 128-lane tile, the
    layout sweep_flat consumes).  Gathers + transposes run per PA_CHUNK
    rows (see above)."""
    n8 = tbl.shape[0]
    idx = (srt & jnp.uint32((1 << idx_bits) - 1)).astype(jnp.int32)

    def block_t(g):
        nb = g.shape[0] // 8
        return g.reshape(nb, 8, PACK_W).transpose(0, 2, 1).reshape(
            nb, PACK_W * 8)

    if n8 <= PA_CHUNK or n8 % PA_CHUNK:
        return block_t(jnp.take(tbl, idx, axis=0))
    return jnp.concatenate(
        [block_t(jnp.take(tbl, idx[s:s + PA_CHUNK], axis=0))
         for s in range(0, n8, PA_CHUNK)], axis=0)


def _phase_b_flat(sr2, bstart, r_max_eff, lanes, lb):
    """Aligned block gather for sweep_flat: [r_steps, nblk, lb, 128].

    sr2: [nb, 128] block-transposed sorted rows (_phase_a output);
    bstart: [lanes] int32 = starts // 8.  Lane l's column holds sorted
    positions bstart[l]*8 .. +r_max_eff; block ids past the array end are
    clamped (those rows are invalid by count)."""
    nb = sr2.shape[0]
    rb = r_max_eff // 8
    nblk = lanes // lb
    ids = jnp.minimum(bstart[None, :]
                      + jax.lax.broadcasted_iota(jnp.int32, (rb, 1), 0),
                      nb - 1).reshape(-1)
    blk = jnp.take(sr2, ids, axis=0)                     # [rb*lanes, 128]
    return blk.reshape(rb, nblk, lb, PACK_W * 8)


def _meta_flat(smod, cnts, lanes, lb):
    """[2, lanes] int32 -> [nblk, 2, lb]."""
    nblk = lanes // lb
    meta = jnp.stack([smod, cnts])
    return meta.reshape(2, nblk, lb).transpose(1, 0, 2)


def _sweep_jnp(data, meta_flat):
    """jnp bucket accumulation (CPU fallback for msm_pallas.sweep_flat):
    fori_loop of batched unchecked mixed-adds over the same packed flat
    layout; the loop-carried accumulator is the bucket table.
    data: [r_steps, nblk, lb, 128]; meta_flat: [nblk, 2, lb] int32.
    Returns (x, y, z [nblk, 16, lb], bad [nblk, 1, lb]) like sweep_flat."""
    r_steps, nblk, lb, _ = data.shape
    lanes = nblk * lb
    r_max_eff = r_steps * 8
    # [r_steps, nblk, lb, 16, 8] -> [r_steps, 8, 16, lanes]: slot r of a
    # lane is element (r // 8, r % 8)
    d = data.reshape(r_steps, nblk, lb, PACK_W, 8)
    d = jnp.transpose(d, (0, 4, 3, 1, 2)).reshape(r_steps * 8, PACK_W, lanes)
    smod = meta_flat[:, 0, :].reshape(lanes)
    cnts = meta_flat[:, 1, :].reshape(lanes)

    def body(r, carry):
        acc, bad = carry
        row = jax.lax.dynamic_index_in_dim(d, r, axis=0, keepdims=False)
        xr = jnp.stack([(row[i // 2] >> (16 * (i % 2))) & 0xFFFF
                        for i in range(NLIMBS)])
        yw = [row[8 + i // 2] >> (16 * (i % 2)) for i in range(NLIMBS)]
        yr = jnp.stack([w & 0xFFFF for w in yw[:NLIMBS - 1]]
                       + [yw[NLIMBS - 1] & 0x3FFF])
        p_inf = (row[FLAG_WORD] >> 31) != 0
        valid = (r >= smod) & (r < smod + cnts)
        q_inf = ~valid | p_inf
        acc, b = ec.add_mixed_unchecked(acc, (xr, yr, q_inf))
        return acc, bad | (b & ~q_inf)[None].astype(jnp.uint32)

    bad0 = jnp.zeros((1, lanes), dtype=jnp.uint32)
    (bx, by, bz), bad = jax.lax.fori_loop(0, r_max_eff, body,
                                          (ec.infinity(lanes), bad0))
    shape = lambda a: a.reshape(NLIMBS, nblk, lb).transpose(1, 0, 2)
    return shape(bx), shape(by), shape(bz), bad.reshape(1, nblk, lb) \
        .transpose(1, 0, 2)


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

    Each phase is a fori_loop whose round parameters (shift, mask bound)
    derive from the loop index, so the whole reduction compiles THREE fold
    bodies instead of ~2*log2(lanes) distinct unrolled copies — the
    unrolled form dominated both XLA-CPU test compiles (minutes per extra
    EC graph) and the TPU program build.

    Returns (totals [16, G] x3, badvec)."""
    total = pts[0].shape[1]
    cols = jnp.arange(total, dtype=jnp.int32) % lanes

    def carry_in(pts, badvec):
        return pts[0], pts[1], pts[2], badvec

    if repl > 1:
        def sub_body(i, st):
            x, y, z, bad = st
            h = jnp.int32(repl) >> (i + 1)
            mask = ((cols % repl) < h).astype(jnp.uint32)
            (x, y, z), bad = fold((x, y, z), bad, mask, h)
            return x, y, z, bad
        st = jax.lax.fori_loop(0, repl.bit_length() - 1, sub_body,
                               carry_in(pts, badvec))
        pts, badvec = st[:3], st[3]
        pts = (pts[0], pts[1],
               jnp.where((cols % repl == 0)[None], pts[2], 0))
    nrep = lanes // repl
    rounds_up = max(0, nrep.bit_length() - 1)

    def up_body(i, st):
        x, y, z, bad = st
        d = jnp.int32(1) << i
        mask = (cols < (nrep - d) * repl).astype(jnp.uint32)
        (x, y, z), bad = fold((x, y, z), bad, mask, d * repl)
        return x, y, z, bad

    st = jax.lax.fori_loop(0, rounds_up, up_body, carry_in(pts, badvec))

    def down_body(i, st):
        x, y, z, bad = st
        d = jnp.int32(nrep) >> (i + 1)
        mask = (cols < d * repl).astype(jnp.uint32)
        (x, y, z), bad = fold((x, y, z), bad, mask, d * repl)
        return x, y, z, bad

    st = jax.lax.fori_loop(0, rounds_up, down_body, st)
    pts, badvec = st[:3], st[3]
    totals = tuple(a[:, ::lanes] for a in pts)
    return totals, badvec


def _window_buckets(tbl, srt, *, n, lanes, r_max, repl, use_pallas,
                    interpret=False, idx_bits=IDX_BITS):
    """One window's bucket table from its sorted packed elements: fused
    gather+transpose -> aligned block gather -> sweep.  Returns (bx, by,
    bz [16, lanes] planar, badvec [1, lanes] u32, overflow)."""
    from . import msm_pallas

    keys_sorted = (srt >> idx_bits).astype(jnp.int32)
    starts, counts = _lane_layout(keys_sorted, n=n, lanes=lanes, repl=repl)
    bstart = starts // 8
    smod = starts % 8
    r_max_eff = r_max + 8          # alignment slop: runs start mid-block
    overflow = jnp.max(smod + counts) > r_max_eff
    counts = jnp.minimum(counts, r_max_eff - smod)
    sr2 = _phase_a(tbl, srt, idx_bits)

    lb = min(LB, lanes)
    data = _phase_b_flat(sr2, bstart, r_max_eff, lanes, lb)
    meta = _meta_flat(smod, counts, lanes, lb)
    if use_pallas:
        ox, oy, oz, ob = msm_pallas.sweep_flat(data, meta,
                                               interpret=interpret)
    else:
        ox, oy, oz, ob = _sweep_jnp(data, meta)
    bx, by, bz = (o.transpose(1, 0, 2).reshape(NLIMBS, lanes)
                  for o in (ox, oy, oz))
    badvec = ob.transpose(1, 0, 2).reshape(1, lanes)
    return bx, by, bz, badvec, overflow


def _window_from_sorted(tbl, srt, *, n, lanes, r_max, repl, use_pallas,
                        interpret=False, idx_bits=IDX_BITS):
    """One Pippenger window from presorted packed elements:
    gathers -> sweep -> weighted bucket reduction.
    Returns (Jacobian total [16, 1] x3, overflow, bad)."""
    bx, by, bz, badvec, overflow = _window_buckets(
        tbl, srt, n=n, lanes=lanes, r_max=r_max, repl=repl,
        use_pallas=use_pallas, interpret=interpret, idx_bits=idx_bits)
    totals, bad2 = _reduce_weighted(
        (bx, by, bz), badvec, lanes=lanes, repl=repl,
        fold=_get_fold(use_pallas, interpret))
    bad = jnp.any(bad2 != 0)
    return totals[0], totals[1], totals[2], overflow, bad


def _window_kernel(x, y, inf, digits, *, n, lanes, r_max, repl,
                   use_pallas=False, interpret=False):
    """One window from raw unsigned digits (sorts internally).  Kept for
    direct kernel tests and the sharded per-device MSM; the fused MSM uses
    the batched sort + a prebuilt packed table.  Packs (digit, idx) into
    one u32 with just enough index bits for n8 — callers must keep
    c + ceil(log2(n8)) <= 32."""
    tbl = build_packed_table(x, y, inf)
    n8 = tbl.shape[0]
    idx_bits = max(1, (n8 - 1).bit_length())
    d = digits.astype(jnp.uint32)
    if n8 > d.shape[0]:
        d = jnp.pad(d, (0, n8 - d.shape[0]))
    assert int(lanes).bit_length() + idx_bits <= 33, (lanes, n8)
    iota = jax.lax.broadcasted_iota(jnp.uint32, (1, n8), 1)[0]
    srt = jax.lax.sort((d << idx_bits) | iota)
    return _window_from_sorted(tbl, srt, n=n8, lanes=lanes, r_max=r_max,
                               repl=repl, use_pallas=use_pallas,
                               interpret=interpret, idx_bits=idx_bits)


def _window_pallas(x, y, inf, digits, *, n, lanes, r_max, repl,
                   interpret=False):
    """One window from raw unsigned digits — pallas sweep path."""
    return _window_kernel(x, y, inf, digits, n=n, lanes=lanes, r_max=r_max,
                          repl=repl, use_pallas=True, interpret=interpret)


def _combine_body(wx, wy, wz, W: int, c: int):
    """Window combine: result = sum_w 2^(c*w) * W_w via Horner from the top
    window (c doublings + one complete add per window), on [W, 16, 1]
    Jacobian stacks."""
    def body(i, acc):
        acc = jax.lax.fori_loop(0, c, lambda _, p: ec.double(p), acc)
        w = W - 2 - i
        return ec.add(acc, (wx[w], wy[w], wz[w]))
    return jax.lax.fori_loop(0, W - 1, body, (wx[W - 1], wy[W - 1], wz[W - 1]))


def _windows_from_packed(tbl, packed, *, n, lanes, c, W, uni, mid, top,
                         use_pallas=False):
    """All Pippenger window totals from a [W, n] packed digit matrix: one
    batched single-operand sort, then every window's buckets + weighted
    reduction.  Returns (wx, wy, wz [W, 16, 1] Jacobian stacks, overflow,
    bad).  The sharded multi-chip MSM runs this per device shard and
    combines across the mesh; the single-chip MSM follows it with the
    on-device window combine (_msm_from_packed).

    lax.map (sequential scan, body compiled once) rather than vmap over the
    uniform windows: each window already saturates the VPU, the batched
    lowering of the padded gather miscompiles on TPU (observed: identical
    batch rows producing different results), and the scanned form keeps
    only one window's gathered data live in HBM."""
    srt = jax.lax.sort(packed, dimension=1)              # [W, n]

    uni_fn = partial(_window_buckets, n=n, lanes=lanes, r_max=uni["r_max"],
                     repl=1, use_pallas=use_pallas)
    mid_fn = partial(_window_from_sorted, n=n, lanes=lanes,
                     r_max=mid["r_max"], repl=mid["repl"],
                     use_pallas=use_pallas)
    top_fn = partial(_window_from_sorted, n=n, lanes=lanes,
                     r_max=top["r_max"], repl=top["repl"],
                     use_pallas=use_pallas)
    # uniform windows 0..W-3: per-window bucket tables (lax.map), then ONE
    # batched weighted reduction over all windows side by side; windows
    # W-2 (mass-skewed) and W-1 (top, replicated) run with their own
    # configs (see window_configs)
    bxs, bys, bzs, bads, ovfs = jax.lax.map(
        lambda s: uni_fn(tbl, s), srt[:W - 2])
    cat = lambda a: jnp.transpose(a, (1, 0, 2)).reshape(NLIMBS, (W - 2) * lanes)
    totals, badcat = _reduce_weighted(
        (cat(bxs), cat(bys), cat(bzs)),
        jnp.transpose(bads, (1, 0, 2)).reshape(1, (W - 2) * lanes),
        lanes=lanes, repl=1, fold=_get_fold(use_pallas, False))
    ovf = ovfs
    bad = jnp.any(badcat != 0)
    # [16, W-2] -> [W-2, 16, 1]
    tx, ty, tz = (jnp.transpose(a, (1, 0))[:, :, None] for a in totals)
    mx, my, mz, movf, mbad = mid_fn(tbl, srt[W - 2])
    hx, hy, hz, hovf, hbad = top_fn(tbl, srt[W - 1])
    wx = jnp.concatenate([tx, mx[None], hx[None]], axis=0)
    wy = jnp.concatenate([ty, my[None], hy[None]], axis=0)
    wz = jnp.concatenate([tz, mz[None], hz[None]], axis=0)
    ovf = jnp.any(ovf) | movf | hovf
    bad = jnp.any(bad) | mbad | hbad
    return wx, wy, wz, ovf, bad


def _msm_from_packed(tbl, packed, *, n, lanes, c, W, uni, mid, top,
                     use_pallas=False):
    """Full MSM from a [W, n] packed digit matrix: windows + on-device
    combine.  Returns (result, overflow, bad) — overflow means a lane run
    exceeded r_max (retry with a roomier config); bad means a degenerate
    unchecked add fired (host fallback)."""
    from . import msm_pallas
    wx, wy, wz, ovf, bad = _windows_from_packed(
        tbl, packed, n=n, lanes=lanes, c=c, W=W, uni=uni, mid=mid, top=top,
        use_pallas=use_pallas)
    if use_pallas:
        res = msm_pallas.combine(wx, wy, wz, W, c)
    else:
        res = _combine_body(wx, wy, wz, W, c)
    return res, ovf, bad


@lru_cache(maxsize=None)
def _msm_digits_jit(n, lanes, c, W, uni_key, mid_key, top_key, use_pallas):
    """One-dispatch MSM from host-computed digits (msm() path).  Takes
    (tbl, digits [W, n] int32) — packing with the index iota happens
    in-program."""
    def run(tbl, digits):
        iota = jax.lax.broadcasted_iota(jnp.uint32, (1, n), 1)[0]
        packed = (digits.astype(jnp.uint32) << IDX_BITS) | iota[None]
        return _msm_from_packed(tbl, packed, n=n, lanes=lanes, c=c, W=W,
                                uni=dict(uni_key), mid=dict(mid_key),
                                top=dict(top_key), use_pallas=use_pallas)
    return jax.jit(run)


@lru_cache(maxsize=None)
def _msm_vec_jit(n, n_in, lanes, c, W, uni_key, mid_key, top_key,
                 use_pallas):
    """One-dispatch MSM from device Montgomery Fr limbs: from-Montgomery,
    digit decomposition, all windows, and the window combine fused into a
    single compiled program (per-op dispatch through the remote-TPU tunnel
    costs ~10ms; the eager variant spent seconds on it per MSM)."""
    def run(tbl, v_mont):
        raw = mont.from_mont(mont.FR, v_mont)
        if n_in < n:
            raw = jnp.pad(raw, ((0, 0), (0, n - n_in)))
        packed = _digits_packed(raw, c, W)
        return _msm_from_packed(tbl, packed, n=n, lanes=lanes, c=c,
                                W=W, uni=dict(uni_key), mid=dict(mid_key),
                                top=dict(top_key), use_pallas=use_pallas)
    return jax.jit(run)


def window_configs(n8: int, c: int, lanes: int) -> dict:
    """Mass-derived lane configs for the three window classes of an
    n8-point shard (tight + safe r_max tiers).  Shared by the single-chip
    _Chunk and the per-device shard of the distributed MSM — the shard MUST
    size its windows from its LOCAL point count with the same mid/top mass
    skews, or large shards overflow the mid window almost surely."""

    def rmax_tight(mean):
        # P[Binomial(n, 1/buckets) > mean + 5 sqrt(mean)] ~ 3e-7 per
        # lane: a 2^20 MSM (90K lane-windows) retries ~3% of the time
        mean = max(1, mean)
        return _round_up(mean + 5 * math.isqrt(mean) + 8, 8)

    def rmax_safe(mean):
        # < 2^-40 per lane — overflow here means adversarial structure
        mean = max(1, mean)
        return _round_up(mean + 8 * math.isqrt(mean) + 64, 8)

    half = 1 << c
    num_windows = -(-254 // c)
    out = {}
    # uniform windows (0..W-3): each key's probability mass for a
    # uniform scalar < FR_MODULUS is within 1e-4 of 1/2^c, so one
    # bucket per lane with a mean-sized run
    mean_uni = -(-n8 // (half - 1))
    out["uni"] = dict(repl=1, r_max=rmax_tight(mean_uni))
    out["uni_safe"] = dict(out["uni"], r_max=rmax_safe(mean_uni))
    # top window (W-1): the digit is bounded by the modulus' top bits —
    # for c=12 only keys 0..3 occur (digits are unsigned: no carry
    # slack) and each has mass <= 2^((W-1)c)/r (~0.33), concentrating
    # n/3 points per bucket.  Replication spreads each hot bucket over
    # `repl` sub-lanes; r_max is sized from the worst KEY MASS, not
    # from n/num_keys (key masses here are far from uniform).
    shift_top = (num_windows - 1) * c
    max_key = min(half - 1, FR_MODULUS >> shift_top)
    repl = 1
    while 2 * repl * (max_key + 1) <= lanes:
        repl *= 2
    mean_top = -(-n8 * (1 << shift_top) // (FR_MODULUS * repl))
    out["top"] = dict(repl=repl, r_max=rmax_tight(mean_top))
    out["top_safe"] = dict(out["top"], r_max=rmax_safe(mean_top))
    # window W-2 rides below the truncated top window, so its key
    # masses are skewed by (T+1)/T where T = floor(r / 2^((W-1)c)) —
    # for c=12, T=3: keys below r's bits (W-2)c..(W-1)c carry 4/3 of
    # the uniform mass (the 4th period of the digit pattern is cut off
    # by r).  The window spans the full key range, so sub-lane
    # replication cannot fit in `lanes`; it simply gets a mass-sized
    # (larger) r_max of its own.
    shift_mid = (num_windows - 2) * c
    mass_num = (FR_MODULUS >> shift_top) + 1    # (T+1) periods
    mean_mid = -(-n8 * mass_num * (1 << shift_mid) // FR_MODULUS)
    out["mid"] = dict(repl=1, r_max=rmax_tight(mean_mid))
    out["mid_safe"] = dict(out["mid"], r_max=rmax_safe(mean_mid))
    return out


class _Chunk:
    """Device-prepared bases + window configs for one <=2^20-point chunk."""

    def __init__(self, x, y, inf, c, lanes):
        n = x.shape[1]
        assert n <= MAX_CHUNK, n
        self.tbl = jax.jit(build_packed_table)(x, y, inf)
        self.n8 = int(self.tbl.shape[0])
        self.n = n
        half = 1 << c
        # one lane per bucket key 1..2^c-1 (keys are 1-based; zero digits
        # are excluded by the sort order); lane 2^c-1 (key 2^c) stays empty
        self.lanes = lanes
        assert self.lanes >= half and self.lanes % 1024 == 0, self.lanes
        cfg = window_configs(self.n8, c, lanes)
        self.uni, self.uni_safe = cfg["uni"], cfg["uni_safe"]
        self.mid, self.mid_safe = cfg["mid"], cfg["mid_safe"]
        self.top, self.top_safe = cfg["top"], cfg["top_safe"]
        # hashable configs for the lru_cached jit factories
        self.uni_key = tuple(sorted(self.uni.items()))
        self.mid_key = tuple(sorted(self.mid.items()))
        self.top_key = tuple(sorted(self.top.items()))
        self.uni_safe_key = tuple(sorted(self.uni_safe.items()))
        self.mid_safe_key = tuple(sorted(self.mid_safe.items()))
        self.top_safe_key = tuple(sorted(self.top_safe.items()))


class MSMContext:
    """Device-resident prepared bases for repeated MSMs over one SRS.

    MSMs larger than 2^20 points (the packed sort element's index bound)
    split into chunks whose Jacobian partial results are summed on host —
    the same long-axis decomposition the sharded multi-chip MSM uses."""

    def __init__(self, points, c: int = 12, lanes: int = None):
        self.host_points = list(points)
        self.host_points_loader = None
        self.n = len(points)
        x, y, inf = ec.affine_from_host(points)
        self._init_params(x, y, inf, c, lanes)

    @classmethod
    def from_device_affine(cls, x, y, inf, c: int = 12, lanes: int = None,
                           host_points_loader=None):
        ctx = cls.__new__(cls)
        ctx.host_points = None
        ctx.host_points_loader = host_points_loader
        ctx.n = x.shape[1]
        ctx._init_params(x, y, inf, c, lanes)
        return ctx

    def _init_params(self, x, y, inf, c, lanes):
        # the fused msm_vec path packs `digit << IDX_BITS | idx` into ONE
        # u32 (single-operand sort): c + IDX_BITS must fit 32 bits, or
        # high digits silently wrap onto low bucket keys (c=13 was broken
        # exactly this way — wrong commitments, pathological lane runs)
        assert c + IDX_BITS <= 32, (c, IDX_BITS)
        self.c = c
        self.num_windows = -(-254 // c)
        self.lanes = (1 << c) if lanes is None else lanes
        self.chunks = []
        for s in range(0, self.n, MAX_CHUNK):
            e = min(s + MAX_CHUNK, self.n)
            self.chunks.append(
                _Chunk(x[:, s:e], y[:, s:e], inf[s:e], c, self.lanes))
        # VMEM-resident pallas sweep on TPU; jnp accumulation on CPU (Mosaic
        # kernels don't run there and interpret mode is orders slower)
        from . import pallas_kernels as pk
        self._use_pallas = not pk._use_jnp_fallback()

    def msm(self, scalars) -> "host affine point":
        """scalars: list of python ints (len <= n). Returns host affine point."""
        scalars = [s % FR_MODULUS for s in scalars]
        if len(scalars) < self.n:
            scalars = scalars + [0] * (self.n - len(scalars))

        def run_chunk(ck, s, e, uni_key, mid_key, top_key):
            sc = scalars[s:e] + [0] * (ck.n8 - (e - s))
            digits = jnp.asarray(digits_np(sc, self.c, self.num_windows))
            fn = _msm_digits_jit(ck.n8, ck.lanes, self.c, self.num_windows,
                                 uni_key, mid_key, top_key, self._use_pallas)
            return fn(ck.tbl, digits)

        return self._finish(run_chunk, lambda: scalars)

    def _vec_run_chunk(self, v_mont, ck, s, e, uni_key, mid_key, top_key):
        n_in = v_mont.shape[1]
        m = max(0, min(e, n_in) - s)
        v = v_mont[:, s:s + m] if m else \
            jnp.zeros((v_mont.shape[0], 0), v_mont.dtype)
        fn = _msm_vec_jit(ck.n8, m, ck.lanes, self.c, self.num_windows,
                          uni_key, mid_key, top_key, self._use_pallas)
        return fn(ck.tbl, v)

    def msm_vec_begin(self, v_mont):
        """Queue the fused MSM programs for every chunk WITHOUT syncing the
        device; resolve with msm_vec_end.  Lets callers dispatch several
        commitments back-to-back (the prover's 4 wire commits, 4 quotient
        commits) so the per-MSM flag check doesn't serialize the queue."""
        pend = [(ck, i * MAX_CHUNK, i * MAX_CHUNK + ck.n,
                 self._vec_run_chunk(v_mont, ck, i * MAX_CHUNK,
                                     i * MAX_CHUNK + ck.n, ck.uni_key,
                                     ck.mid_key, ck.top_key))
                for i, ck in enumerate(self.chunks)]
        return (v_mont, pend)

    def msm_vec_end(self, handle) -> "host affine point":
        v_mont, pend = handle

        def run_chunk(ck, s, e, uni_key, mid_key, top_key):
            return self._vec_run_chunk(v_mont, ck, s, e, uni_key, mid_key,
                                       top_key)

        def fallback_scalars():
            n_in = v_mont.shape[1]
            return mont.FR.from_mont_np(np.asarray(v_mont)) + \
                [0] * (self.n - n_in)

        return self._finish(run_chunk, fallback_scalars, pend=pend)

    def msm_vec(self, v_mont) -> "host affine point":
        """v_mont: [16, N] device Montgomery Fr limbs (N <= n).  One fused
        dispatch per chunk: digits are extracted on device, no python-int
        round trip."""
        return self.msm_vec_end(self.msm_vec_begin(v_mont))

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

    def _finish(self, run_chunk, fallback_scalars, pend=None):
        if pend is None:
            pend = [(ck, i * MAX_CHUNK, i * MAX_CHUNK + ck.n,
                     run_chunk(ck, i * MAX_CHUNK, i * MAX_CHUNK + ck.n,
                               ck.uni_key, ck.mid_key, ck.top_key))
                    for i, ck in enumerate(self.chunks)]
        results = []
        for i, (ck, s, e, out) in enumerate(pend):
            res, ovf, bad = out
            ovf_np, bad_np, res_np = jax.device_get((ovf, bad, res))
            if bool(ovf_np) and not bool(bad_np):
                # a lane run exceeded the tight r_max: retry on device with
                # the conservative padding
                log.info("MSM lane overflow (chunk %d, n=%d): retrying with "
                         "safe r_max", i, ck.n)
                res, ovf, bad = run_chunk(ck, s, e, ck.uni_safe_key,
                                          ck.mid_safe_key, ck.top_safe_key)
                ovf_np, bad_np, res_np = jax.device_get((ovf, bad, res))
            if bool(ovf_np) or bool(bad_np):
                # degenerate add or adversarial bucket skew (structured
                # scalar vectors) — fall back to host (correctness first)
                log.info("MSM device flags (ovf=%s bad=%s, chunk %d): host "
                         "fallback", bool(ovf_np), bool(bad_np), i)
                return self._host_fallback(fallback_scalars)
            results.append(ec.to_affine_host(res_np)[0])
        if len(results) == 1:
            return results[0]
        from ..curve import g1_add
        acc = results[0]
        for p in results[1:]:
            acc = g1_add(acc, p)
        return acc
