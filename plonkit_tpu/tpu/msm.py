"""Pippenger multi-scalar multiplication on TPU (SURVEY §7 step 3, hot
kernel #1).

TPU has no efficient random-access scatter, so the classic per-bucket
accumulation is reformulated as:

  1. signed c-bit digit decomposition (host numpy, vectorized);
  2. per window: sort point indices by |digit| (XLA sort), gather points;
  3. **lane-partitioned serial accumulation**: bucket space is split into
     contiguous ranges, one per vector lane, so no bucket's points ever
     span two lanes.  A fori_loop walks R_max rows of the [R_max, C]
     lane-padded matrix doing one batched mixed-add per row; when a lane's
     digit changes the finished bucket sum is scatter-SET (conflict-free by
     construction) into the bucket table;
  4. weighted bucket reduction sum(b * S_b) via two Hillis-Steele passes
     (suffix scan + prefix reduction) of batched Jacobian adds;
  5. window results are combined on host (16 points, exact).

Lane padding R_max is 4x the mean load; for uniformly-distributed scalars
(the PLONK prover's polynomials are effectively uniform) overflow
probability is cryptographically negligible, but it is *checked* on device
and reported, and the caller falls back to the host MSM on overflow.
"""

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

from ..fields import FR_MODULUS
from . import ec, mont
from .mont import FQ, NLIMBS

DUMP = -1  # placeholder


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


def _window_kernel(x, y, inf, digits, *, n_pad, c, lanes, r_max, bpl):
    """One Pippenger window entirely on device.

    x, y: [16, n_pad] affine Montgomery coords; inf: [n_pad] bool;
    digits: [n_pad] int32 signed; bpl: buckets per lane (the top window has
    a truncated digit range, so its partition must cover fewer keys or all
    points collapse into a handful of lanes).  Returns (bucket-reduced
    Jacobian point [16, 1] x3, overflow flag)."""
    num_buckets = (1 << (c - 1)) + 1          # bucket 0 unused + 1..2^(c-1)
    dump = num_buckets                        # extra dump column

    keys = jnp.abs(digits)
    keys = jnp.where(inf, 0, keys)
    neg_y = mont.neg(FQ, y)
    y_signed = jnp.where((digits < 0)[None], neg_y, y)

    # sort by key, carry the original index
    iota = jax.lax.broadcasted_iota(jnp.int32, (n_pad,), 0)
    keys_sorted, perm = jax.lax.sort_key_val(keys, iota)
    xs = jnp.take(x, perm, axis=1)
    ys = jnp.take(y_signed, perm, axis=1)

    # lane-partitioned layout: lane l owns buckets [l*bpl, (l+1)*bpl)
    lane_start_keys = jnp.arange(lanes, dtype=jnp.int32) * bpl
    starts = jnp.searchsorted(keys_sorted, lane_start_keys, side="left").astype(jnp.int32)
    # key-0 points (zero digits / infinity) contribute nothing: skip them in
    # lane 0 so sparse scalar vectors (structured selector polynomials!)
    # neither overflow the lane nor waste accumulation rows
    zero_end = jnp.searchsorted(keys_sorted, 1, side="left").astype(jnp.int32)
    starts = jnp.maximum(starts, zero_end)
    ends = jnp.concatenate([starts[1:], jnp.asarray([n_pad], dtype=jnp.int32)])
    counts = ends - starts
    overflow = jnp.max(counts) > r_max

    # padded gather matrix [r_max, lanes]
    rows = jax.lax.broadcasted_iota(jnp.int32, (r_max, lanes), 0)
    gidx = starts[None, :] + rows
    valid = rows < counts[None, :]
    gidx = jnp.where(valid, jnp.minimum(gidx, n_pad - 1), 0)
    kpad = jnp.where(valid, jnp.take(keys_sorted, gidx), dump)   # [r_max, lanes]
    xpad = jnp.take(xs, gidx.reshape(-1), axis=1).reshape(NLIMBS, r_max, lanes)
    ypad = jnp.take(ys, gidx.reshape(-1), axis=1).reshape(NLIMBS, r_max, lanes)

    # serial accumulation with conflict-free flush
    zero3 = ec.infinity(lanes)
    buckets = tuple(jnp.zeros((NLIMBS, num_buckets + 1), dtype=jnp.uint32) for _ in range(3))
    one = mont.one_mont(FQ, (lanes,))

    def body(r, carry):
        acc, prev_key, buckets = carry
        kr = jax.lax.dynamic_index_in_dim(kpad, r, axis=0, keepdims=False)
        xr = jax.lax.dynamic_index_in_dim(xpad, r, axis=1, keepdims=False)
        yr = jax.lax.dynamic_index_in_dim(ypad, r, axis=1, keepdims=False)
        is_real = kr != dump
        start = kr != prev_key
        # flush finished runs (prev_key valid and key changed)
        flush = start & (prev_key != dump) & (prev_key != 0)
        fk = jnp.where(flush, prev_key, num_buckets)
        # non-flush lanes all target the dump column; garbage there is fine
        buckets = tuple(b.at[:, fk].set(v) for b, v in zip(buckets, acc))
        # extend or restart the run
        lifted = (xr, yr, jnp.where(is_real[None], one, jnp.zeros_like(one)))
        added = ec.add_mixed(acc, (xr, yr, ~is_real))
        acc = ec.select(start, lifted, added)
        return acc, kr, buckets

    init_key = jnp.full((lanes,), dump, dtype=jnp.int32)
    acc, prev_key, buckets = jax.lax.fori_loop(0, r_max, body, (zero3, init_key, buckets))
    # final flush
    flush = (prev_key != dump) & (prev_key != 0)
    fk = jnp.where(flush, prev_key, num_buckets)
    buckets = tuple(b.at[:, fk].set(v) for b, v in zip(buckets, acc))

    # weighted reduction sum_b b * S_b over columns 1..num_buckets-1:
    # suffix scan then total sum, both as Hillis-Steele add-shift rounds.
    bx, by, bz = (b[:, :num_buckets] for b in buckets)
    bz = bz.at[:, 0].set(0)  # bucket 0 excluded

    def shift_cols_left(p, d):
        # (x, y, z) shifted left by d columns, vacated columns = infinity (z=0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (num_buckets,), 0)
        mask = cols < (num_buckets - d)
        return tuple(jnp.where(mask[None], jnp.roll(a, -d, axis=1), 0) for a in p)

    rounds = max(1, (num_buckets - 1).bit_length())

    def hillis_body(i, p):
        d = jnp.int32(1) << i
        return ec.add(p, shift_cols_left(p, d))

    p = jax.lax.fori_loop(0, rounds, hillis_body, (bx, by, bz))
    # p[:, b] = sum_{k>=b} S_k ; total = sum_{b>=1} p[:, b]
    q = shift_cols_left(p, 1)
    q = jax.lax.fori_loop(0, rounds, hillis_body, q)
    total = tuple(a[:, :1] for a in q)
    return total + (overflow,)


@lru_cache(maxsize=None)
def _digits_jit(c: int, num_windows: int):
    """Device-side signed digit decomposition from [16, N] canonical 16-bit
    limbs (mirror of signed_digits_np): keeps MSM inputs on device so
    repeated commitments never round-trip through python ints."""
    half = 1 << (c - 1)

    def f(raw):
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
    return jax.jit(f)


@lru_cache(maxsize=None)
def _window_jit(n_pad, c, lanes, r_max, bpl):
    return jax.jit(partial(_window_kernel, n_pad=n_pad, c=c, lanes=lanes,
                           r_max=r_max, bpl=bpl))


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
        num_buckets = (1 << (c - 1)) + 1
        if lanes is None:
            # each lane must own several buckets so per-lane load averages
            # out bucket-count variance (Poisson tails); cap so the serial
            # accumulation depth r_max stays reasonable
            lanes = max(128, min(2048, num_buckets // 4, self.n // 16 or 128))
        self.lanes = lanes
        # per-window partition: the top window's digit magnitude is bounded
        # by 2^(255 - (W-1)*c), usually far below 2^(c-1)
        self.window_params = []
        for w in range(self.num_windows):
            if w == self.num_windows - 1:
                top_bits = max(1, 255 - w * c)
                key_hi = min((1 << (c - 1)), 1 << top_bits) + 1
            else:
                key_hi = (1 << (c - 1)) + 1
            bpl = -(-key_hi // lanes)
            eff_lanes = min(lanes, -(-key_hi // bpl))
            mean = max(1, self.n // eff_lanes)
            # 4x mean + slack: overflow probability is cryptographically
            # small for uniform scalars (checked on device regardless)
            r_max = 4 * mean + 64
            self.window_params.append((bpl, r_max))

    def msm(self, scalars) -> "host affine point":
        """scalars: list of python ints (len <= n). Returns host affine point."""
        scalars = [s % FR_MODULUS for s in scalars]
        if len(scalars) < self.n:
            scalars = scalars + [0] * (self.n - len(scalars))
        digits = signed_digits_np(scalars, self.c, self.num_windows)
        rows = [jnp.asarray(digits[w]) for w in range(self.num_windows)]
        return self._run_windows(rows, lambda: scalars)

    def msm_vec(self, v_mont) -> "host affine point":
        """v_mont: [16, N] device Montgomery Fr limbs (N <= n).  Digits are
        extracted on device -- no python-int round trip."""
        raw = mont.from_mont(mont.FR, v_mont)
        if raw.shape[1] < self.n:
            raw = jnp.pad(raw, ((0, 0), (0, self.n - raw.shape[1])))
        digits = _digits_jit(self.c, self.num_windows)(raw)
        raw_host = None

        def fallback_scalars():
            return mont.FR.from_limbs_np(np.asarray(raw))

        return self._run_windows([digits[w] for w in range(self.num_windows)],
                                 fallback_scalars)

    def _run_windows(self, digit_rows, fallback_scalars):
        from ..curve import g1_add, g1_mul, g1_msm_host
        window_points = []
        for w in range(self.num_windows):
            bpl, r_max = self.window_params[w]
            fn = _window_jit(self.n, self.c, self.lanes, r_max, bpl)
            tx, ty, tz, overflow = fn(self.x, self.y, self.inf, digit_rows[w])
            if bool(overflow):
                # adversarial bucket skew -- fall back to host (correctness first)
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
            window_points.append((tx, ty, tz))
        # combine on host: result = sum_w 2^(c w) * W_w
        result = None
        for w in reversed(range(self.num_windows)):
            pt = ec.to_affine_host(window_points[w])[0]
            if result is not None:
                result = g1_mul(result, 1 << self.c)
            result = g1_add(result, pt)
        return result
