"""Full recursive aggregation e2e on the real TPU: dev SRS 2^22 ->
inner rescue proofs -> aggregation circuit prove2 -> verify/check."""
import logging, os, sys, time
logging.basicConfig(level="INFO", format="[%(asctime)s] %(message)s")
sys.path.insert(0, "/root/repo")
# no JAX_PLATFORMS override: run on the axon TPU

import jax
try:
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass
print("device:", jax.devices()[0])

from plonkit_tpu.api import SetupForProver, verify
from plonkit_tpu.serialization import Crs, CrsHandle
from plonkit_tpu.backend import HostBackend
from plonkit_tpu.backend_jax import JaxBackend
from scratch.agg_smoke import rich_inner_circuit

SRS22 = "/tmp/srs_2pow22.key"
POWER = 22

t0 = time.time()
if not os.path.exists(SRS22):
    from plonkit_tpu.tpu.fixed_base import gen_crs_g1_device
    from plonkit_tpu.curve import G2_GEN, g2_mul
    from plonkit_tpu.api import DEV_TAU
    g1 = gen_crs_g1_device(POWER)
    srs = Crs(g1, [G2_GEN, g2_mul(G2_GEN, DEV_TAU)])
    srs.save(SRS22)
    del srs, g1
print(f"[{time.time()-t0:7.1f}s] srs ready ({os.path.getsize(SRS22)/2**20:.0f} MiB)")

crs_small = Crs.load("/root/reference/keys/setup/setup_2^10.key")
c = rich_inner_circuit()
inner_setup = SetupForProver(c, crs_small, backend=HostBackend())
vk = inner_setup.make_verification_key()
pr = inner_setup.prove(c, "rescue")
assert verify(vk, pr, "rescue")
print(f"[{time.time()-t0:7.1f}s] inner rescue proof ok")

from plonkit_tpu.recursive.aggregation import (check_aggregation,
                                               make_recursive_vk,
                                               prove_aggregation,
                                               verify_aggregation)

be = JaxBackend()
crs_big = CrsHandle(SRS22)

t1 = time.time()
rvk = make_recursive_vk(crs_big, vk, 1, backend=be)
print(f"[{time.time()-t0:7.1f}s] recursive vk exported (dummy-witness synthesis, "
      f"{time.time()-t1:.0f}s)")

t1 = time.time()
agg = prove_aggregation(crs_big, [pr], vk, backend=be, validate=False)
print(f"[{time.time()-t0:7.1f}s] aggregated proof done ({time.time()-t1:.0f}s)")
agg.save("/tmp/recursive_proof.bin")

t1 = time.time()
ok = verify_aggregation(rvk, agg, inner_vk=vk)
print(f"[{time.time()-t0:7.1f}s] recursive verify: {ok} ({time.time()-t1:.1f}s)")
assert ok, "recursive proof did not verify!"

ok2 = check_aggregation(vk, [pr], agg)
print(f"[{time.time()-t0:7.1f}s] check-aggregation: {ok2}")
assert ok2

# negative: tamper a limb
agg.aggr_limbs[0] ^= 1
print("tampered limb verify:", verify_aggregation(rvk, agg, inner_vk=vk))
agg.aggr_limbs[0] ^= 1
agg.proof.input_values[0] ^= 1
print("tampered input verify:", verify_aggregation(rvk, agg, inner_vk=vk))
print("ALL E2E CHECKS DONE")
