"""Pippenger multi-scalar multiplication on TPU (SURVEY §7 step 3, hot
kernel #1; reference behavior: bellman_ce multiexp, SURVEY D1c).

TPU has no efficient random-access scatter, so classic per-bucket
accumulation is reformulated so that **no scatter ever happens**:

  1. signed c-bit digit decomposition (host numpy or on-device);
  2. ONE batched sort of all windows' |digit| keys ([W, n], XLA sort along
     the n axis) — a batched sort costs ~1/5 of W sequential sorts;
  3. per window: **one bucket per vector lane**: lane b owns exactly
     bucket b, so the run for bucket b is gathered into column b of a
     [r_max, lanes] padded matrix and a fori_loop of batched *unchecked*
     mixed-adds (11 field muls, no doubling fallback — impossible for
     distinct SRS bases, flagged on device regardless) accumulates it.
     The loop-carried accumulator IS the bucket table: no flush, no
     scatter.
  4. the top window's digits span only 2^(255 mod c) values, so its
     buckets are *replicated* over `repl` sub-lanes (points of one bucket
     are split round-robin across sub-lanes by within-run rank) and the
     sub-lanes are tree-folded afterwards — this keeps the sequential
     depth r_max uniform across windows;
  5. weighted bucket reduction sum(b * S_b) via two Hillis-Steele passes
     (suffix scan + prefix reduction) of batched unchecked Jacobian adds;
  6. windows combined on device (batched doubling + tree fold kernel).

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


def _gather_padded(x, y, digits, perm, starts, counts, *, n, r_max, lanes):
    """Padded gather: column l = lane l's run of sorted point indices.

    Returns (xpad, ypad [16, r_max, lanes] with y sign-folded, inf_u32
    [r_max, lanes], overflow flag).  Counts are clamped to r_max so an
    overflowing layout still produces a well-formed (discarded) kernel
    input."""
    overflow = jnp.max(counts) > r_max
    counts = jnp.minimum(counts, r_max)
    rows = jax.lax.broadcasted_iota(jnp.int32, (r_max, lanes), 0)
    gpos = starts[None, :] + rows
    valid = rows < counts[None, :]
    gpos = jnp.where(valid, jnp.minimum(gpos, n - 1), 0)
    gidx = jnp.take(perm, gpos.reshape(-1))          # original point indices
    xpad = jnp.take(x, gidx, axis=1).reshape(NLIMBS, r_max, lanes)
    ypad = jnp.take(y, gidx, axis=1)                 # [16, r_max*lanes]
    dneg = jnp.take(digits < 0, gidx)
    ypad = jnp.where(dneg[None] & valid.reshape(-1)[None],
                     mont.neg(FQ, ypad), ypad).reshape(NLIMBS, r_max, lanes)
    return xpad, ypad, (~valid).astype(jnp.uint32), overflow


def _sweep_jnp(xpad, ypad, inf_u32):
    """jnp bucket accumulation (CPU fallback for msm_pallas.sweep):
    fori_loop of batched unchecked mixed-adds; the loop-carried accumulator
    is the bucket table."""
    _, r_max, lanes = xpad.shape

    def body(r, carry):
        acc, bad = carry
        xr = jax.lax.dynamic_index_in_dim(xpad, r, axis=1, keepdims=False)
        yr = jax.lax.dynamic_index_in_dim(ypad, r, axis=1, keepdims=False)
        q_inf = jax.lax.dynamic_index_in_dim(inf_u32, r, axis=0,
                                             keepdims=False) != 0
        acc, b = ec.add_mixed_unchecked(acc, (xr, yr, q_inf))
        return acc, bad | (b & ~q_inf)[None].astype(jnp.uint32)

    bad0 = jnp.zeros((1, lanes), dtype=jnp.uint32)
    (bx, by, bz), bad = jax.lax.fori_loop(0, r_max, body,
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


def _window_from_sorted(x, y, digits, keys_sorted, perm, *, n, lanes, r_max,
                        repl, num_buckets, use_pallas, interpret=False):
    """One Pippenger window from presorted keys: padded gather -> sweep ->
    sub-lane fold -> weighted bucket reduction.  Returns (Jacobian total
    [16, 1] x3, overflow, bad)."""
    from . import msm_pallas

    starts, counts = _lane_layout(keys_sorted, n=n, lanes=lanes, repl=repl)
    xpad, ypad, inf_u32, overflow = _gather_padded(
        x, y, digits, perm, starts, counts, n=n, r_max=r_max, lanes=lanes)

    if use_pallas:
        bx, by, bz, badvec = msm_pallas.sweep(xpad, ypad, inf_u32,
                                              interpret=interpret)
        fold = partial(msm_pallas.fold_round, interpret=interpret)
    else:
        bx, by, bz, badvec = _sweep_jnp(xpad, ypad, inf_u32)
        fold = _fold_jnp

    cols = jnp.arange(lanes, dtype=jnp.int32)[None, :]     # [1, lanes]
    nbr = num_buckets * repl
    pts = (bx, by, bz)

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

    # weighted reduction sum_b b*S_b: suffix scan + prefix total, both as
    # Hillis-Steele rounds of masked roll-adds (shift in units of repl)
    rounds = max(1, (num_buckets - 1).bit_length())
    for i in range(rounds):
        d = 1 << i
        mask = (cols < (num_buckets - d) * repl).astype(jnp.uint32)
        pts, badvec = fold(pts, badvec, mask, d * repl)
    # pts[:, b*repl] = sum_{k>=b} S_k; shift one bucket, then total
    shift_mask = cols < (num_buckets - 1) * repl
    pts = tuple(jnp.where(shift_mask, jnp.roll(a, -repl, axis=1), 0) for a in pts)
    for i in range(rounds):
        d = 1 << i
        mask = (cols < (num_buckets - d) * repl).astype(jnp.uint32)
        pts, badvec = fold(pts, badvec, mask, d * repl)

    total = tuple(a[:, :1] for a in pts)
    bad = jnp.any(badvec != 0)
    return total + (overflow, bad)


def _window_kernel(x, y, inf, digits, *, n, lanes, r_max, repl, num_buckets):
    """One window from raw digits (sorts internally) — jnp sweep path.
    Kept for direct kernel tests; the fused MSM uses the batched sort."""
    keys = jnp.where(inf, 0, jnp.abs(digits))
    iota = jax.lax.broadcasted_iota(jnp.int32, (n,), 0)
    keys_sorted, perm = jax.lax.sort_key_val(keys, iota)
    return _window_from_sorted(x, y, digits, keys_sorted, perm, n=n,
                               lanes=lanes, r_max=r_max, repl=repl,
                               num_buckets=num_buckets, use_pallas=False)


def _window_pallas(x, y, inf, digits, *, n, lanes, r_max, repl, num_buckets,
                   interpret=False):
    """One window from raw digits (sorts internally) — pallas sweep path."""
    keys = jnp.where(inf, 0, jnp.abs(digits))
    iota = jax.lax.broadcasted_iota(jnp.int32, (n,), 0)
    keys_sorted, perm = jax.lax.sort_key_val(keys, iota)
    return _window_from_sorted(x, y, digits, keys_sorted, perm, n=n,
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


def _msm_from_digits(x, y, inf, digits, *, n, lanes, c, W, uni, top,
                     use_pallas=False):
    """Full MSM from a [W, n] digit matrix: one batched sort, all windows,
    device combine.  Returns (result, overflow, bad) — overflow means a
    lane run exceeded r_max (retry with a roomier config); bad means a
    degenerate unchecked add fired (host fallback).

    lax.map (sequential scan, body compiled once) rather than vmap over the
    uniform windows: each window already saturates the VPU (lanes x 16 limbs
    wide), the batched lowering of the padded gather miscompiles on TPU
    (observed: identical batch rows producing different results), and the
    scanned form keeps only one window's padded gather live in HBM."""
    keys = jnp.where(inf[None], 0, jnp.abs(digits))            # [W, n]
    iota = jnp.broadcast_to(
        jax.lax.broadcasted_iota(jnp.int32, (1, n), 1), (W, n))
    keys_sorted, perm = jax.lax.sort_key_val(keys, iota, dimension=1)

    uni_fn = partial(_window_from_sorted, n=n, lanes=lanes, r_max=uni["r_max"],
                     repl=1, num_buckets=uni["num_buckets"],
                     use_pallas=use_pallas)
    top_fn = partial(_window_from_sorted, n=n, lanes=lanes, r_max=top["r_max"],
                     repl=top["repl"], num_buckets=top["num_buckets"],
                     use_pallas=use_pallas)
    tx, ty, tz, ovf, bad = jax.lax.map(
        lambda a: uni_fn(x, y, *a),
        (digits[:W - 1], keys_sorted[:W - 1], perm[:W - 1]))
    hx, hy, hz, hovf, hbad = top_fn(x, y, digits[W - 1], keys_sorted[W - 1],
                                    perm[W - 1])
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
    def run(x, y, inf, v_mont):
        raw = mont.from_mont(mont.FR, v_mont)
        if n_in < n:
            raw = jnp.pad(raw, ((0, 0), (0, n - n_in)))
        digits = _digits_body(raw, c, W)
        return _msm_from_digits(x, y, inf, digits, n=n, lanes=lanes, c=c,
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
        self.x, self.y, self.inf = x, y, inf
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
            return fn(self.x, self.y, self.inf, digits)

        return self._finish(run, lambda: scalars)

    def msm_vec(self, v_mont) -> "host affine point":
        """v_mont: [16, N] device Montgomery Fr limbs (N <= n).  One fused
        dispatch: digits are extracted on device, no python-int round trip."""
        def run(uni_key, top_key):
            fn = _msm_vec_jit(self.n, v_mont.shape[1], self.lanes, self.c,
                              self.num_windows, uni_key, top_key,
                              self._use_pallas)
            return fn(self.x, self.y, self.inf, v_mont)

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
