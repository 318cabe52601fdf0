"""Distributed Pippenger MSM over a 1-D device mesh (SURVEY §7 step 11,
§5.8 -- the multi-chip replacement for bellman_ce's multiexp worker pool,
reference behavior: bellman_ce multiexp, SURVEY D1c).

Sharding policy: the SRS points (and the scalar digit matrix) are sharded
in contiguous blocks along the point axis.  Each device runs the
single-chip scatter-free window kernel (tpu.msm._window_kernel) on its
local shard, producing one Jacobian partial per Pippenger window.  Bucket
accumulation is therefore **communication-free**; the only collective is
the final gather of W Jacobian points per device (a few KB), after which
the exact window combine happens on host.  This is the classic
"per-shard bucket accumulation + tree reduction" layout (SURVEY §5.7),
degenerate-case-checked exactly like the single-chip path: any flagged
add or lane overflow falls back to the host/native MSM.
"""

import math
from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from ..fields import FR_MODULUS
from ..tpu import ec
from ..tpu import pallas_kernels as pk
from ..tpu.mont import NLIMBS
from ..tpu.msm import _round_up, _window_kernel, _window_pallas, digits_np
from .mesh import AXIS


_MESHES = {}


def _rmax_for(mean: int) -> int:
    mean = max(1, mean)
    return _round_up(mean + 8 * math.isqrt(mean) + 64, 8)


@lru_cache(maxsize=None)
def _dist_windows_fn(n: int, n_devices: int, c: int, mesh_id: int):
    """shard_map'd per-device window scan: local bucket accumulation for all
    windows of the local point shard, no collectives inside."""
    mesh = _MESHES[mesh_id]
    n_local = n // n_devices
    num_windows = -(-254 // c)
    nkeys = (1 << c) - 1      # unsigned digits: bucket keys 1..2^c-1
    # one lane per 1-based bucket key (see tpu.msm._lane_layout)
    lanes = max(1 << c, 128)
    r_uni = _rmax_for(-(-n_local // nkeys))
    # top-window occupancy is bounded by the modulus' top bits, not the
    # window range; its per-KEY mass is 2^((W-1)c)/r, far from uniform,
    # so the mean is mass-sized (see tpu.msm._Chunk)
    shift_top = (num_windows - 1) * c
    max_key = min(nkeys, FR_MODULUS >> shift_top)
    repl = 1
    while 2 * repl * (max_key + 1) <= lanes and repl < 64:
        repl *= 2
    mean_top1 = -(-n_local * (1 << shift_top) // FR_MODULUS)   # repl = 1
    r_top = _rmax_for(-(-mean_top1 // repl))

    # VMEM-resident pallas sweep on TPU meshes; jnp path on the CPU test mesh
    kern = _window_kernel if pk._use_jnp_fallback() else _window_pallas
    # if the top window's unreplicated runs already fit the uniform r_max
    # (small shards), fold it into the lax.map so the whole MSM compiles
    # ONE window body — XLA-CPU compile of the EC limb graphs is the slow
    # tier's bottleneck and a second (replicated-layout) body doubles it
    fold_top = _rmax_for(mean_top1) <= r_uni
    uni = partial(kern, n=n_local, lanes=lanes, r_max=r_uni, repl=1)
    top = partial(kern, n=n_local, lanes=lanes, r_max=r_top, repl=repl)

    def body(x, y, inf, digits):
        # x, y: [16, n/D]; inf: [n/D]; digits: [W, n/D]
        if fold_top:
            wx, wy, wz, ovf, bad = jax.lax.map(
                lambda d: uni(x, y, inf, d), digits)
            flag = jnp.any(ovf) | jnp.any(bad)
        else:
            tx, ty, tz, ovf, bad = jax.lax.map(
                lambda d: uni(x, y, inf, d), digits[:num_windows - 1])
            hx, hy, hz, hovf, hbad = top(x, y, inf, digits[num_windows - 1])
            wx = jnp.concatenate([tx, hx[None]], axis=0)  # [W, 16, 1]
            wy = jnp.concatenate([ty, hy[None]], axis=0)
            wz = jnp.concatenate([tz, hz[None]], axis=0)
            flag = jnp.any(ovf) | jnp.any(bad) | hovf | hbad
        # leading axis of size 1 concatenates to [D, ...] across the mesh
        return wx[None], wy[None], wz[None], flag[None]

    fn = jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(None, AXIS), P(None, AXIS), P(AXIS), P(None, AXIS)),
        out_specs=(P(AXIS), P(AXIS), P(AXIS), P(AXIS)),
        check_vma=False,
    )
    return jax.jit(fn)


class DistributedMSMContext:
    """Mesh-sharded prepared bases for repeated MSMs over one SRS.

    Mirrors tpu.msm.MSMContext but keeps x/y/inf sharded over the mesh;
    n is padded up to a multiple of the device count with points at
    infinity (digit 0 contributions are skipped by the kernel anyway).
    """

    def __init__(self, mesh, points, c: int = 12):
        self.mesh = mesh
        self.D = mesh.devices.size
        self.c = c
        self.num_windows = -(-254 // c)
        self.host_points = list(points)
        n = _round_up(max(len(points), self.D), self.D)
        padded = self.host_points + [None] * (n - len(points))
        self.n = n
        x, y, inf = ec.affine_from_host(padded)
        shard = NamedSharding(mesh, P(None, AXIS))
        self.x = jax.device_put(x, shard)
        self.y = jax.device_put(y, shard)
        self.inf = jax.device_put(inf, NamedSharding(mesh, P(AXIS)))
        _MESHES[id(mesh)] = mesh

    def msm(self, scalars):
        """scalars: python ints (len <= n).  Returns a host affine point."""
        from ..curve import g1_add, g1_mul
        scalars = [s % FR_MODULUS for s in scalars]
        if len(scalars) < self.n:
            scalars = scalars + [0] * (self.n - len(scalars))
        digits = digits_np(scalars, self.c, self.num_windows)
        dshard = jax.device_put(jnp.asarray(digits),
                                NamedSharding(self.mesh, P(None, AXIS)))
        fn = _dist_windows_fn(self.n, self.D, self.c, id(self.mesh))
        wx, wy, wz, flags = fn(self.x, self.y, self.inf, dshard)
        if bool(jnp.any(flags)):
            from ..curve import g1_msm_host
            from ..native import msm_native
            res = msm_native(self.host_points, scalars[:len(self.host_points)])
            if res is not False:
                return res
            return g1_msm_host(self.host_points, scalars[:len(self.host_points)])
        # gather: [D, W, 16, 1] -> host affine per (device, window)
        W = self.num_windows
        jac = tuple(jnp.transpose(a, (2, 0, 1, 3)).reshape(NLIMBS, self.D * W)
                    for a in (wx, wy, wz))
        pts = ec.to_affine_host(jac)
        result = None
        for w in reversed(range(W)):
            if result is not None:
                result = g1_mul(result, 1 << self.c)
            for d in range(self.D):
                result = g1_add(result, pts[d * W + w])
        return result
