"""Distributed Pippenger MSM over a 1-D device mesh (SURVEY §7 step 11,
§5.8 -- the multi-chip replacement for bellman_ce's multiexp worker pool,
reference behavior: bellman_ce multiexp, SURVEY D1c).

Sharding policy: the SRS points (and the device-resident Montgomery scalar
vector) are sharded in contiguous blocks along the point axis.  Each device
runs THE single-chip engine (tpu.msm: u16-packed 64 B point rows, batched
single-operand sort, unsigned c-bit digits, flat-limb sweep, weighted
bucket reduction — `_windows_from_packed`) on its local shard, producing
one Jacobian partial per Pippenger window.  Bucket accumulation is
communication-free; the only collective is an all_gather of W Jacobian
points per device (a few KB over ICI), after which every device combines
the replicated window stack on-device (complete adds + the Horner window
combine).  Per-window lane configs are mass-derived from the LOCAL shard
size via tpu.msm.window_configs, so the mid/top window skews are sized
exactly like the single-chip path.  Overflow retries with the safe r_max
tier before falling back to the host/native MSM (correctness first)."""

import logging
from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from ..fields import FR_MODULUS
from ..tpu import ec, mont
from ..tpu import pallas_kernels as pk
from ..tpu.mont import NLIMBS
from ..tpu.msm import (MAX_CHUNK, _combine_body, _digits_packed, _round_up,
                       _windows_from_packed, build_packed_table,
                       window_configs)
from .mesh import AXIS

log = logging.getLogger("plonkit_tpu")

_MESHES = {}


@lru_cache(maxsize=None)
def _dist_msm_fn(n: int, n_devices: int, n_in: int, c: int, lanes: int,
                 uni_key, mid_key, top_key, use_pallas: bool, mesh_id: int):
    """shard_map'd distributed MSM: per-device packed-engine windows on the
    local shard, all_gather of the tiny window stacks, replicated on-device
    combine.  Returns (Jacobian result [16, 1] x3, ovf, bad)."""
    mesh = _MESHES[mesh_id]
    n_local = n // n_devices
    assert n_local % 8 == 0 and n_local <= MAX_CHUNK, n_local
    W = -(-254 // c)
    uni, mid, top = dict(uni_key), dict(mid_key), dict(top_key)

    def body(x, y, inf, v):
        # x, y, v: [16, n/D]; inf: [n/D]
        tbl = build_packed_table(x, y, inf)
        raw = mont.from_mont(mont.FR, v)
        packed = _digits_packed(raw, c, W)
        wx, wy, wz, ovf, bad = _windows_from_packed(
            tbl, packed, n=n_local, lanes=lanes, c=c, W=W,
            uni=uni, mid=mid, top=top, use_pallas=use_pallas)
        # [W, 16, 1] -> [16, W] planar columns for the cross-device fold
        gx = jax.lax.all_gather(wx[:, :, 0].transpose(1, 0), AXIS)  # [D,16,W]
        gy = jax.lax.all_gather(wy[:, :, 0].transpose(1, 0), AXIS)
        gz = jax.lax.all_gather(wz[:, :, 0].transpose(1, 0), AXIS)
        flags = jax.lax.all_gather(jnp.stack([ovf, bad]), AXIS)     # [D, 2]

        def dev_fold(d, acc):
            return ec.add(acc, (gx[d], gy[d], gz[d]))
        tx, ty, tz = jax.lax.fori_loop(
            1, n_devices, dev_fold, (gx[0], gy[0], gz[0]))
        res = _combine_body(tx.transpose(1, 0)[:, :, None],
                            ty.transpose(1, 0)[:, :, None],
                            tz.transpose(1, 0)[:, :, None], W, c)
        return (res[0], res[1], res[2],
                jnp.any(flags[:, 0]), jnp.any(flags[:, 1]))

    fn = jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(None, AXIS), P(None, AXIS), P(AXIS), P(None, AXIS)),
        out_specs=(P(), P(), P(), P(), P()),
        check_vma=False,
    )
    return jax.jit(fn)


class DistributedMSMContext:
    """Mesh-sharded prepared bases for repeated MSMs over one SRS.

    Mirrors tpu.msm.MSMContext (same c=12 digit layout, same window
    engine) but keeps x/y/inf sharded over the mesh; n pads up to a
    multiple of 8 * device count with points at infinity.  Accepts host
    point lists OR device affine limb arrays (from_device_affine — the
    CrsHandle streaming path), so multi-chip proving never materializes
    python point objects."""

    def __init__(self, mesh, points, c: int = 12, lanes: int = None):
        x, y, inf = ec.affine_from_host(list(points))
        self._init(mesh, x, y, inf, c, lanes,
                   host_points=list(points))

    @classmethod
    def from_device_affine(cls, mesh, x, y, inf, c: int = 12,
                           lanes: int = None, host_points_loader=None):
        ctx = cls.__new__(cls)
        ctx._init(mesh, x, y, inf, c, lanes,
                  host_points_loader=host_points_loader)
        return ctx

    def _init(self, mesh, x, y, inf, c, lanes, host_points=None,
              host_points_loader=None):
        self.mesh = mesh
        self.D = mesh.devices.size
        self.c = c
        self.num_windows = -(-254 // c)
        self.lanes = (1 << c) if lanes is None else lanes
        self.host_points = host_points
        self.host_points_loader = host_points_loader
        n_pts = x.shape[1]
        n = _round_up(max(n_pts, self.D), 8 * self.D)
        assert n // self.D <= MAX_CHUNK, \
            f"per-device shard {n // self.D} exceeds the packed index bound"
        self.n_pts = n_pts
        self.n = n
        if n > n_pts:
            pad = n - n_pts
            x = jnp.pad(x, ((0, 0), (0, pad)))
            y = jnp.pad(y, ((0, 0), (0, pad)))
            inf = jnp.pad(inf.astype(jnp.uint32), (0, pad),
                          constant_values=1).astype(inf.dtype)
        shard = NamedSharding(mesh, P(None, AXIS))
        self.x = jax.device_put(x, shard)
        self.y = jax.device_put(y, shard)
        self.inf = jax.device_put(inf, NamedSharding(mesh, P(AXIS)))
        cfg = window_configs(n // self.D, c, self.lanes)
        self._keys = tuple(tuple(sorted(cfg[k].items()))
                           for k in ("uni", "mid", "top"))
        self._safe_keys = tuple(tuple(sorted(cfg[k].items()))
                                for k in ("uni_safe", "mid_safe", "top_safe"))
        self._use_pallas = not pk._use_jnp_fallback()
        _MESHES[id(mesh)] = mesh

    def _run(self, v_sharded, keys):
        fn = _dist_msm_fn(self.n, self.D, self.n, self.c, self.lanes,
                          keys[0], keys[1], keys[2], self._use_pallas,
                          id(self.mesh))
        return fn(self.x, self.y, self.inf, v_sharded)

    def _place_scalars(self, v_mont):
        n_in = v_mont.shape[1]
        if n_in < self.n:
            v_mont = jnp.pad(v_mont, ((0, 0), (0, self.n - n_in)))
        return jax.device_put(v_mont, NamedSharding(self.mesh, P(None, AXIS)))

    def msm_vec(self, v_mont) -> "host affine point":
        """v_mont: [16, N] device Montgomery Fr limbs (N <= n)."""
        v = self._place_scalars(v_mont)
        rx, ry, rz, ovf, bad = self._run(v, self._keys)
        ovf_np, bad_np = jax.device_get((ovf, bad))
        if bool(ovf_np) and not bool(bad_np):
            log.info("distributed MSM lane overflow (n=%d, D=%d): retrying "
                     "with safe r_max", self.n, self.D)
            rx, ry, rz, ovf, bad = self._run(v, self._safe_keys)
            ovf_np, bad_np = jax.device_get((ovf, bad))
        if bool(ovf_np) or bool(bad_np):
            log.info("distributed MSM device flags (ovf=%s bad=%s): host "
                     "fallback", bool(ovf_np), bool(bad_np))
            return self._host_fallback(v_mont)
        res_np = jax.device_get((rx, ry, rz))
        return ec.to_affine_host(res_np)[0]

    def msm(self, scalars) -> "host affine point":
        """scalars: python ints (len <= n).  Returns a host affine point."""
        scalars = [s % FR_MODULUS for s in scalars]
        raw = jnp.asarray(mont.FR.to_limbs_np(scalars))
        v_mont = jax.jit(partial(mont.to_mont, mont.FR))(raw)
        return self.msm_vec(v_mont)

    def _host_fallback(self, v_mont):
        from ..curve import g1_msm_host
        from ..native import msm_native
        if self.host_points is None and self.host_points_loader is not None:
            self.host_points = list(self.host_points_loader())[:self.n_pts]
        if self.host_points is None:
            raise RuntimeError(
                "distributed MSM flagged and no host fallback points")
        scalars = mont.FR.from_mont_np(np.asarray(v_mont))
        scalars = scalars[:len(self.host_points)] + \
            [0] * max(0, len(self.host_points) - len(scalars))
        res = msm_native(self.host_points, scalars)
        if res is not False:
            return res
        return g1_msm_host(self.host_points, scalars)
