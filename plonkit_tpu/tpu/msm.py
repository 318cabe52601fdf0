"""Pippenger multi-scalar multiplication on TPU (SURVEY §7 step 3, hot
kernel #1; reference behavior: bellman_ce multiexp, SURVEY D1c).

TPU has no efficient random-access scatter, so classic per-bucket
accumulation is reformulated so that **no scatter ever happens**:

  1. signed c-bit digit decomposition (host numpy or on-device);
  2. per window: sort point indices by |digit| (XLA sort) — equal digits
     become contiguous runs;
  3. **one bucket per vector lane**: lane b owns exactly bucket b, so the
     run for bucket b is gathered into column b of a [r_max, lanes] padded
     matrix and a fori_loop of batched *unchecked* mixed-adds (11 field
     muls, no doubling fallback — impossible for distinct SRS bases,
     flagged on device regardless) accumulates it.  The loop-carried
     accumulator IS the bucket table: no flush, no scatter.
  4. the top window's digits span only 2^(255 mod c) values, so its
     buckets are *replicated* over `repl` sub-lanes (points of one bucket
     are split round-robin across sub-lanes by within-run rank) and the
     sub-lanes are tree-folded afterwards — this keeps the sequential
     depth r_max uniform across windows;
  5. weighted bucket reduction sum(b * S_b) via two Hillis-Steele passes
     (suffix scan + prefix reduction) of batched unchecked Jacobian adds;
  6. window results are combined on host (≤20 points, exact).

Lane padding r_max is mean + 8*sqrt(mean) + 64: for uniformly-distributed
scalars (the PLONK prover's witness polynomials are effectively uniform)
the binomial per-bucket count exceeds that with probability < 2^-40.
Structured scalar vectors (e.g. 0/1 selector polynomials) can overflow a
lane or trip the doubling flag; both are *checked on device* and the
caller falls back to the native C++ / host MSM (correctness first —
those commitments happen once per setup, not per proof).
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


def _window_kernel(x, y, inf, digits, *, n, lanes, r_max, repl, num_buckets):
    """One Pippenger window entirely on device, scatter-free.

    x, y: [16, n] affine Montgomery coords; inf: [n] bool; digits: [n]
    int32 signed.  Lane l accumulates sub-bucket l; bucket key of lane l
    is l // repl.  Returns (Jacobian total [16, 1] x3, overflow, bad).
    """
    keys = jnp.abs(digits)
    keys = jnp.where(inf, 0, keys)
    iota = jax.lax.broadcasted_iota(jnp.int32, (n,), 0)
    keys_sorted, perm = jax.lax.sort_key_val(keys, iota)

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
    # skip key-0 points (zero digits / infinity): they contribute nothing
    zero_end = jnp.searchsorted(keys_sorted, 1, side="left").astype(jnp.int32)
    starts = jnp.maximum(starts, zero_end)
    ends = jnp.concatenate([starts[1:], jnp.asarray([n], dtype=jnp.int32)])
    counts = ends - starts
    overflow = jnp.max(counts) > r_max

    # padded gather: column l = lane l's run of sorted positions
    rows = jax.lax.broadcasted_iota(jnp.int32, (r_max, lanes), 0)
    gpos = starts[None, :] + rows
    valid = rows < counts[None, :]
    gpos = jnp.where(valid, jnp.minimum(gpos, n - 1), 0)
    gidx = jnp.take(perm, gpos.reshape(-1))          # original point indices
    xpad = jnp.take(x, gidx, axis=1).reshape(NLIMBS, r_max, lanes)
    ypad = jnp.take(y, gidx, axis=1).reshape(NLIMBS, r_max, lanes)
    dneg = jnp.take(digits < 0, gidx).reshape(r_max, lanes)

    def body(r, carry):
        acc, bad = carry
        xr = jax.lax.dynamic_index_in_dim(xpad, r, axis=1, keepdims=False)
        yr = jax.lax.dynamic_index_in_dim(ypad, r, axis=1, keepdims=False)
        nr = jax.lax.dynamic_index_in_dim(dneg, r, axis=0, keepdims=False)
        vr = jax.lax.dynamic_index_in_dim(valid, r, axis=0, keepdims=False)
        yr = jnp.where(nr[None], mont.neg(FQ, yr), yr)
        acc, b = ec.add_mixed_unchecked(acc, (xr, yr, ~vr))
        return acc, bad | jnp.any(b & vr)

    bad0 = jnp.zeros((), dtype=bool)
    pts, bad = jax.lax.fori_loop(0, r_max, body, (ec.infinity(lanes), bad0))

    if repl > 1:
        # tree-fold sub-lanes: [16, num_buckets, repl] -> [16, num_buckets]
        pts = tuple(a[:, :num_buckets * repl].reshape(NLIMBS, num_buckets, repl)
                    for a in pts)
        step = repl
        while step > 1:
            h = step // 2
            lhs = tuple(a[:, :, :h] for a in pts)
            rhs = tuple(a[:, :, h:step] for a in pts)
            pts, b = ec.add_unchecked(lhs, rhs)
            bad = bad | jnp.any(b)
            step = h
        pts = tuple(a[:, :, 0] for a in pts)
    else:
        pts = tuple(a[:, :num_buckets] for a in pts)

    # weighted reduction sum_b b * S_b over buckets 1..num_buckets-1:
    # suffix scan then total sum, both as Hillis-Steele add-shift rounds.
    bx, by, bz = pts
    bz = bz.at[:, 0].set(0)  # bucket 0 excluded
    pts = (bx, by, bz)

    def shift_cols_left(p, d):
        # (x, y, z) shifted left by d columns, vacated columns = infinity
        cols = jax.lax.broadcasted_iota(jnp.int32, (num_buckets,), 0)
        mask = cols < (num_buckets - d)
        return tuple(jnp.where(mask[None], jnp.roll(a, -d, axis=1), 0) for a in p)

    rounds = max(1, (num_buckets - 1).bit_length())

    def hillis_body(i, carry):
        p, bad = carry
        s, b = ec.add_unchecked(p, shift_cols_left(p, jnp.int32(1) << i))
        return s, bad | jnp.any(b)

    pts, bad = jax.lax.fori_loop(0, rounds, hillis_body, (pts, bad))
    # pts[:, b] = sum_{k>=b} S_k ; total = sum_{b>=1} pts[:, b]
    q = shift_cols_left(pts, 1)
    q, bad = jax.lax.fori_loop(0, rounds, hillis_body, (q, bad))
    total = tuple(a[:, :1] for a in q)
    return total + (overflow, bad)


def _window_pallas(x, y, inf, digits, *, n, lanes, r_max, repl, num_buckets,
                   interpret=False):
    """Pallas variant of _window_kernel: same sort/gather prologue (XLA),
    then the VMEM-resident sweep + fold kernels from msm_pallas.py (the
    jnp accumulation loop is HBM-bound because XLA does not fuse the
    ~700-op mixed-add graph; see msm_pallas.py)."""
    from . import msm_pallas

    keys = jnp.abs(digits)
    keys = jnp.where(inf, 0, keys)
    iota = jax.lax.broadcasted_iota(jnp.int32, (n,), 0)
    keys_sorted, perm = jax.lax.sort_key_val(keys, iota)

    if repl > 1:
        first = jnp.searchsorted(keys_sorted, keys_sorted, side="left").astype(jnp.int32)
        last = jnp.searchsorted(keys_sorted, keys_sorted, side="right").astype(jnp.int32)
        per = (last - first + repl - 1) // repl
        sub = (iota - first) // jnp.maximum(per, 1)
        subkeys = keys_sorted * repl + sub
    else:
        subkeys = keys_sorted

    lane_ids = jnp.arange(lanes, dtype=jnp.int32)
    starts = jnp.searchsorted(subkeys, lane_ids, side="left").astype(jnp.int32)
    zero_end = jnp.searchsorted(keys_sorted, 1, side="left").astype(jnp.int32)
    starts = jnp.maximum(starts, zero_end)
    ends = jnp.concatenate([starts[1:], jnp.asarray([n], dtype=jnp.int32)])
    counts = ends - starts
    overflow = jnp.max(counts) > r_max

    rows = jax.lax.broadcasted_iota(jnp.int32, (r_max, lanes), 0)
    gpos = starts[None, :] + rows
    valid = rows < counts[None, :]
    gpos = jnp.where(valid, jnp.minimum(gpos, n - 1), 0)
    gidx = jnp.take(perm, gpos.reshape(-1))
    xpad = jnp.take(x, gidx, axis=1).reshape(NLIMBS, r_max, lanes)
    ypad = jnp.take(y, gidx, axis=1)                       # [16, r_max*lanes]
    dneg = jnp.take(digits < 0, gidx)
    ypad = jnp.where(dneg[None] & valid.reshape(-1)[None],
                     mont.neg(FQ, ypad), ypad).reshape(NLIMBS, r_max, lanes)
    inf_u32 = (~valid).astype(jnp.uint32)

    bx, by, bz, badvec = msm_pallas.sweep(xpad, ypad, inf_u32,
                                          interpret=interpret)

    cols = jnp.arange(lanes, dtype=jnp.int32)[None, :]     # [1, lanes]
    nbr = num_buckets * repl
    pts = (bx, by, bz)

    # sub-lane tree fold (top window): lane = bucket*repl + sub
    step = repl
    while step > 1:
        h = step // 2
        mask = ((cols % repl) < h).astype(jnp.uint32)
        pts, badvec = msm_pallas.fold_round(pts, badvec, mask, h,
                                            interpret=interpret)
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
        pts, badvec = msm_pallas.fold_round(pts, badvec, mask, d * repl,
                                            interpret=interpret)
    # pts[:, b*repl] = sum_{k>=b} S_k; shift one bucket, then total
    shift_mask = cols < (num_buckets - 1) * repl
    pts = tuple(jnp.where(shift_mask, jnp.roll(a, -repl, axis=1), 0) for a in pts)
    for i in range(rounds):
        d = 1 << i
        mask = (cols < (num_buckets - d) * repl).astype(jnp.uint32)
        pts, badvec = msm_pallas.fold_round(pts, badvec, mask, d * repl,
                                            interpret=interpret)

    total = tuple(a[:, :1] for a in pts)
    bad = jnp.any(badvec != 0)
    return total + (overflow, bad)


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
    """Full MSM from a [W, n] digit matrix: all windows + device combine.
    lax.map (sequential scan, body compiled once) rather than vmap over the
    uniform windows: each window already saturates the VPU (lanes x 16 limbs
    wide), the batched lowering of the padded gather miscompiles on TPU
    (observed: identical batch rows producing different results), and the
    scanned form keeps only one window's padded gather live in HBM."""
    kern = _window_pallas if use_pallas else _window_kernel
    uni_fn = partial(kern, n=n, lanes=lanes, r_max=uni["r_max"],
                     repl=1, num_buckets=uni["num_buckets"])
    top_fn = partial(kern, n=n, lanes=lanes, r_max=top["r_max"],
                     repl=top["repl"], num_buckets=top["num_buckets"])
    tx, ty, tz, ovf, bad = jax.lax.map(
        lambda d: uni_fn(x, y, inf, d), digits[:W - 1])
    hx, hy, hz, hovf, hbad = top_fn(x, y, inf, digits[W - 1])
    wx = jnp.concatenate([tx, hx[None]], axis=0)
    wy = jnp.concatenate([ty, hy[None]], axis=0)
    wz = jnp.concatenate([tz, hz[None]], axis=0)
    if use_pallas:
        from . import msm_pallas
        res = msm_pallas.combine(wx, wy, wz, W, c)
    else:
        res = _combine_body(wx, wy, wz, W, c)
    flag = jnp.any(ovf) | jnp.any(bad) | hovf | hbad
    return res, flag


@lru_cache(maxsize=None)
def _msm_digits_jit(n, lanes, c, W, uni_key, top_key, use_pallas):
    """One-dispatch MSM from host-computed digits (msm() path)."""
    fn = partial(_msm_from_digits, n=n, lanes=lanes, c=c, W=W,
                 uni=dict(uni_key), top=dict(top_key), use_pallas=use_pallas)
    return jax.jit(fn)


@lru_cache(maxsize=None)
def _msm_vec_jit(n, n_in, lanes, c, W, uni_key, top_key, use_pallas):
    """One-dispatch MSM from device Montgomery Fr limbs: from-Montgomery,
    digit decomposition, all windows, and the Horner combine fused into a
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

        def rmax_for(mean):
            mean = max(1, mean)
            return _round_up(mean + 8 * math.isqrt(mean) + 64, 8)

        # uniform windows: one bucket per lane
        mean_uni = -(-self.n // max(1, nk_uniform - 1))
        self.uni = dict(repl=1, num_buckets=nk_uniform, r_max=rmax_for(mean_uni))
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
        self.top = dict(repl=repl, num_buckets=key_hi, r_max=rmax_for(mean_top))
        # hashable configs for the lru_cached jit factories
        self._uni_key = tuple(sorted(self.uni.items()))
        self._top_key = tuple(sorted(self.top.items()))
        # VMEM-resident pallas sweep on TPU; jnp accumulation on CPU (Mosaic
        # kernels don't run there and interpret mode is orders slower)
        from . import pallas_kernels as pk
        self._use_pallas = not pk._use_jnp_fallback()

    def msm(self, scalars) -> "host affine point":
        """scalars: list of python ints (len <= n). Returns host affine point."""
        scalars = [s % FR_MODULUS for s in scalars]
        if len(scalars) < self.n:
            scalars = scalars + [0] * (self.n - len(scalars))
        digits = signed_digits_np(scalars, self.c, self.num_windows)
        fn = _msm_digits_jit(self.n, self.lanes, self.c, self.num_windows,
                             self._uni_key, self._top_key, self._use_pallas)
        res, flag = fn(self.x, self.y, self.inf, jnp.asarray(digits))
        return self._finish(res, flag, lambda: scalars)

    def msm_vec(self, v_mont) -> "host affine point":
        """v_mont: [16, N] device Montgomery Fr limbs (N <= n).  One fused
        dispatch: digits are extracted on device, no python-int round trip."""
        fn = _msm_vec_jit(self.n, v_mont.shape[1], self.lanes, self.c,
                          self.num_windows, self._uni_key, self._top_key,
                          self._use_pallas)
        res, flag = fn(self.x, self.y, self.inf, v_mont)

        def fallback_scalars():
            return mont.FR.from_mont_np(np.asarray(v_mont)) + \
                [0] * (self.n - v_mont.shape[1])

        return self._finish(res, flag, fallback_scalars)

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

    def _finish(self, res, flag, fallback_scalars):
        flag_np, res_np = jax.device_get((flag, res))
        if bool(flag_np):
            # lane overflow or a flagged degenerate add (structured scalars /
            # adversarial skew) -- fall back to host (correctness first)
            return self._host_fallback(fallback_scalars)
        return ec.to_affine_host(res_np)[0]
