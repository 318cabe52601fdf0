"""Mesh-sharded compute backend: the multi-chip execution engine behind
the REAL PLONK prover.

`MeshBackend` implements the same interface as backend.HostBackend /
backend_jax.JaxBackend, so `plonk.prover.prove()` (and setup, and the
extended system) run UNCHANGED over an N-device `jax.sharding.Mesh` —
this is the TPU-native replacement for threading bellman's `Worker`
through every prover entry point (reference: src/plonk.rs:41,47,183,
src/recursive/mod.rs:55; SURVEY §5.8).

Sharding policy (SURVEY §5.7 "scale the long axis"):

  * every [16, n] Fr limb vector is sharded along the domain axis
    (PartitionSpec(None, "shard")) whenever n divides the device count;
    small/odd vectors replicate.
  * NTT/iNTT go through the Bailey 4-step decomposition
    (parallel/ntt.py): all_to_all transposes between local batched
    sub-transforms, so butterflies never cross devices.  Coset variants
    wrap the same transform with on-device power-ladder scalings; the LDE
    zero-pads monomials to the extended domain first.
  * elementwise ops, prefix/suffix scans (grand product, divide-by-
    linear) and evaluations inherit the JaxBackend implementations: they
    are jnp/lax expressions, so XLA's SPMD partitioner turns the rolls
    of the Hillis-Steele rounds into collective permutes over the mesh
    automatically — no hand-written communication.
  * MSMs shard the SRS points over the mesh with per-device bucket
    accumulation and a final all-gather of W Jacobian partials
    (parallel/msm.py DistributedMSMContext); bucket accumulation itself
    is communication-free.  Tiny MSMs and the CPU test mesh keep the
    host/native context (same policy as JaxBackend).

The virtual 8-device CPU mesh (XLA_FLAGS=--xla_force_host_platform_
device_count=8) exercises every collective without TPU hardware; the
driver's dryrun runs the full golden-circuit prove on it and checks the
proof bytes against the reference artifact (__graft_entry__.py).
"""

from typing import Sequence

import jax
import jax.numpy as jnp

from ..backend_jax import FrVec, JaxBackend, _const_mont, _pow_vec
from ..fields import FR_GENERATOR, FR_MODULUS as R, fr_inv
from ..tpu import pallas_kernels as pk
from ..tpu.mont import FR, NLIMBS
from .mesh import domain_sharding, make_mesh, replicated
from .ntt import _split, distributed_ntt


class MeshBackend(JaxBackend):
    name = "mesh"

    def __init__(self, mesh=None, n_devices: int = None,
                 interpret: bool = False):
        super().__init__(interpret=interpret)
        self.mesh = mesh if mesh is not None else make_mesh(n_devices)
        self.D = self.mesh.devices.size
        self._shard = domain_sharding(self.mesh)
        self._rep = replicated(self.mesh)

    # -- placement ---------------------------------------------------------

    def _place(self, data) -> FrVec:
        n = data.shape[1]
        if n >= self.D and n % self.D == 0:
            return FrVec(jax.device_put(data, self._shard))
        return FrVec(jax.device_put(data, self._rep))

    def from_ints(self, values: Sequence[int], pad_to: int = None) -> FrVec:
        return self._place(super().from_ints(values, pad_to).data)

    def from_raw_limbs(self, raw) -> FrVec:
        return self._place(super().from_raw_limbs(raw).data)

    def zeros(self, n: int) -> FrVec:
        return self._place(super().zeros(n).data)

    def tile_small(self, values: Sequence[int], total: int) -> FrVec:
        return self._place(super().tile_small(values, total).data)

    def onload(self, h) -> FrVec:
        return self._place(super().onload(h).data)

    def concat(self, vs: Sequence[FrVec]) -> FrVec:
        return self._place(super().concat(vs).data)

    # -- NTT (distributed 4-step) -------------------------------------------

    def _can_distribute(self, n: int) -> bool:
        # the 4-step shards both sub-axes: need D | n1 and D | n2
        if n & (n - 1) or n < 4:
            return False
        n1, n2 = _split(n)
        return n1 % self.D == 0 and n2 % self.D == 0

    def ntt(self, v: FrVec) -> FrVec:
        if self._can_distribute(len(v)):
            return FrVec(distributed_ntt(v.data, self.mesh,
                                         interpret=self.interpret))
        return self._place(super().ntt(v).data)

    def intt(self, v: FrVec) -> FrVec:
        if self._can_distribute(len(v)):
            return FrVec(distributed_ntt(v.data, self.mesh, inverse=True,
                                         interpret=self.interpret))
        return self._place(super().intt(v).data)

    def _coset_scale(self, data, shift: int, inverse: bool):
        n = data.shape[1]
        s = fr_inv(shift % R) if inverse else (shift % R)
        pows = _pow_vec(_const_mont(s), n, self.interpret)
        return pk.mul(FR, data, pows, interpret=self.interpret)

    def coset_ntt(self, v: FrVec, shift: int = FR_GENERATOR) -> FrVec:
        if self._can_distribute(len(v)):
            scaled = self._coset_scale(v.data, shift, inverse=False)
            return FrVec(distributed_ntt(scaled, self.mesh,
                                         interpret=self.interpret))
        return self._place(super().coset_ntt(v, shift).data)

    def coset_intt(self, v: FrVec, shift: int = FR_GENERATOR) -> FrVec:
        if self._can_distribute(len(v)):
            m = distributed_ntt(v.data, self.mesh, inverse=True,
                                interpret=self.interpret)
            return FrVec(self._coset_scale(m, shift, inverse=True))
        return self._place(super().coset_intt(v, shift).data)

    def coset_lde(self, v: FrVec, factor: int,
                  shift: int = FR_GENERATOR) -> FrVec:
        ext = len(v) * factor
        if self._can_distribute(ext):
            padded = jnp.concatenate(
                [v.data, jnp.zeros((NLIMBS, ext - len(v)), jnp.uint32)],
                axis=1)
            padded = jax.device_put(padded, self._shard)
            scaled = self._coset_scale(padded, shift, inverse=False)
            return FrVec(distributed_ntt(scaled, self.mesh,
                                         interpret=self.interpret))
        return self._place(super().coset_lde(v, factor, shift).data)

    # -- MSM -----------------------------------------------------------------

    def _use_dist_msm(self, size: int) -> bool:
        # PLONKIT_TPU_MESH_MSM: auto (default) = distributed on real
        # devices, host context on the CPU test mesh (the EC window
        # kernel's XLA-CPU compile takes minutes); force = always
        # distributed (the slow tier uses it to run the sharded MSM inside
        # a real prove); host = never
        import os
        mode = os.environ.get("PLONKIT_TPU_MESH_MSM", "auto")
        if mode == "force":
            return True
        if mode == "host":
            return False
        return size > 4096 and jax.default_backend() != "cpu"

    def msm_context(self, bases, key=None):
        if key is not None and key in self._msm_cache:
            ctx = self._msm_cache[key]
            if ctx.n >= len(bases):
                return ctx
        if not self._use_dist_msm(len(bases)):
            from ..backend import _HostMSMContext
            ctx = _HostMSMContext(bases)
        else:
            from .msm import DistributedMSMContext
            ctx = DistributedMSMContext(self.mesh, bases, c=self._dist_c())
        if key is not None:
            self._msm_cache[key] = ctx
        return ctx

    @staticmethod
    def _dist_c() -> int:
        # narrower digits shrink the XLA-CPU compile of the EC window
        # graphs; the slow tier sets 8 when forcing the sharded MSM on the
        # virtual mesh (production TPU meshes keep the default)
        import os
        return int(os.environ.get("PLONKIT_TPU_DIST_MSM_C", "12"))

    def msm_context_from_crs(self, crs, size: int, key=None):
        if key is not None and key in self._msm_cache:
            ctx = self._msm_cache[key]
            if ctx.n >= size:
                return ctx
        if not self._use_dist_msm(size):
            from ..backend import _HostMSMContext
            ctx = _HostMSMContext(crs.g1_bases[:size])
        else:
            from ..serialization import CrsHandle
            from ..tpu import mont
            from .msm import DistributedMSMContext
            if isinstance(crs, CrsHandle):
                # streaming limb path: no host python points materialized
                x_raw, y_raw, inf = crs.g1_limbs(size)
                to_mont = jax.jit(lambda r: mont.to_mont(mont.FQ, r))
                ctx = DistributedMSMContext.from_device_affine(
                    self.mesh, to_mont(jnp.asarray(x_raw)),
                    to_mont(jnp.asarray(y_raw)), jnp.asarray(inf),
                    c=self._dist_c(),
                    host_points_loader=lambda h=crs: h.g1_bases)
            else:
                ctx = DistributedMSMContext(self.mesh, crs.g1_bases[:size],
                                            c=self._dist_c())
        if key is not None:
            self._msm_cache[key] = ctx
        return ctx
