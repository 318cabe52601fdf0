"""Distributed NTT: Bailey/Cooley-Tukey 4-step decomposition over a device
mesh (SURVEY §5.7/§5.8 -- the framework's "scale the long axis" story).

n = n1 * n2; the flattened domain is sharded in contiguous blocks.
Viewing x as row-major [n1, n2]:

  step 0: all_to_all   row-sharded -> column-sharded
  step 1: local length-n1 NTTs along rows-axis (batched over local columns)
  step 2: twiddle A[k1, j2] *= w_n^(k1*j2)  (gathered from a power table)
  step 3: all_to_all   column-sharded -> row-sharded
  step 4: local length-n2 NTTs along the columns-axis
  step 5: global transpose (all_to_all + local transpose) back to natural
          order: X[k1 + n1*k2] = A''[k1, k2]

Everything reuses the single-chip Pease butterfly kernel via ntt_batched.
"""

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from ..fields import FR_MODULUS as R, fr_inv, get_domain_omega
from ..tpu import ntt as tntt, pallas_kernels as pk
from ..tpu.mont import FR, NLIMBS
from .mesh import AXIS


def _split(n: int):
    """n = n1 * n2 with n1 <= n2, both powers of two."""
    log_n = n.bit_length() - 1
    l1 = log_n // 2
    return 1 << l1, 1 << (log_n - l1)


def _dist_ntt_impl(x_local, omega_pows, n: int, n_devices: int, inverse: bool,
                   interpret: bool):
    """shard_map body.  x_local: [16, n/D] contiguous block of the flattened
    row-major [n1, n2] domain."""
    n1, n2 = _split(n)
    D = n_devices
    # local rows view: [16, n1/D, n2]
    a = x_local.reshape(NLIMBS, n1 // D, n2)
    # -> column shard [16, n1, n2/D]
    a = jax.lax.all_to_all(a, AXIS, split_axis=2, concat_axis=1, tiled=True)
    # length-n1 NTT along axis 1 (batched over local columns)
    a = tntt.ntt_batched(a, inverse=inverse, interpret=interpret)
    # twiddle: A[k1, j2] *= w^(k1 * j2); j2 global = j2_local + (n2/D)*dev
    dev = jax.lax.axis_index(AXIS)
    k1 = jax.lax.broadcasted_iota(jnp.int32, (n1, n2 // D), 0)
    j2 = jax.lax.broadcasted_iota(jnp.int32, (n1, n2 // D), 1) + dev * (n2 // D)
    tw_idx = (k1 * j2) % n
    tw = jnp.take(omega_pows, tw_idx.reshape(-1), axis=1)
    a = pk.mul(FR, a.reshape(NLIMBS, n1 * n2 // D), tw, interpret=interpret)
    a = a.reshape(NLIMBS, n1, n2 // D)
    # -> row shard [16, n1/D, n2]
    a = jax.lax.all_to_all(a, AXIS, split_axis=1, concat_axis=2, tiled=True)
    # length-n2 NTT along axis 2: transpose to [16, n2, n1/D]
    a = jnp.swapaxes(a, 1, 2)
    a = tntt.ntt_batched(a, inverse=inverse, interpret=interpret)
    # now a[k2_axis, k1_local] with k1 = k1_local + (n1/D)*dev;
    # natural order X[k] = A''[k1, k2] flattened with k = k1 + n1*k2,
    # i.e. output viewed [n2, n1] row-major sharded along k1 (axis 2).
    # global transpose to contiguous-k sharding: target [16, n2/D, n1] rows of
    # the [n2, n1] matrix.
    a = jax.lax.all_to_all(a.reshape(NLIMBS, n2, n1 // D), AXIS,
                           split_axis=1, concat_axis=2, tiled=True)
    # a: [16, n2/D, n1] = rows k2 local, all k1 -> flatten: k local-major:
    # element (k2_l, k1) = X[k1 + n1*(k2_l + dev*(n2/D))] -> local flat index
    # k1 + n1*k2_l: contiguous block of X of length n1*(n2/D) = n/D. BUT the
    # flattening below is row-major over (k2_l, k1) which matches k1 + n1*k2_l
    # ordering only if we keep (k2_l, k1) axis order. [16, n2/D, n1] reshaped
    # row-major gives exactly that.
    return a.reshape(NLIMBS, n // D)


@lru_cache(maxsize=None)
def _dist_ntt_fn(n: int, n_devices: int, inverse: bool, interpret: bool, mesh_id: int):
    from .mesh import make_mesh
    mesh = _MESHES[mesh_id]
    fn = jax.shard_map(
        partial(_dist_ntt_impl, n=n, n_devices=n_devices, inverse=inverse,
                interpret=interpret),
        mesh=mesh,
        in_specs=(P(None, AXIS), P()),
        out_specs=P(None, AXIS),
        check_vma=False,
    )
    return jax.jit(fn)


_MESHES = {}


def distributed_ntt(x, mesh, inverse: bool = False, interpret: bool = False):
    """x: [16, n] sharded (or shardable) along axis 1 over the 1-D mesh.
    Natural-order in, natural-order out.  With inverse=True this IS the full
    iNTT: the two batched sub-transforms each apply their 1/m scaling, which
    compose to the required 1/n."""
    n = x.shape[1]
    D = mesh.devices.size
    omega = get_domain_omega(n)
    if inverse:
        omega = fr_inv(omega)
    omega_pows = jnp.asarray(tntt._powers_np(omega, n))
    _MESHES[id(mesh)] = mesh
    fn = _dist_ntt_fn(n, D, inverse, interpret, id(mesh))
    return fn(x, omega_pows)


def distributed_intt(x, mesh, interpret: bool = False):
    return distributed_ntt(x, mesh, inverse=True, interpret=interpret)
