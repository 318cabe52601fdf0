import random, time
import jax.numpy as jnp
from plonkit_tpu.curve import G1_GEN, g1_mul, g1_msm_host
from plonkit_tpu.fields import FR_MODULUS as R
from plonkit_tpu.tpu import ec
from plonkit_tpu.tpu.msm import _window_kernel, signed_digits_np

rng = random.Random(3)
n, c = 96, 5
points = [g1_mul(G1_GEN, rng.randrange(1, R)) for _ in range(n)]
scalars = [rng.randrange(R) for _ in range(n)]
W = -(-255 // c)
digits = signed_digits_np(scalars, c, W)
x, y, inf = ec.affine_from_host(points)
for w in (0, 3, W-1):
    repl = 1 if w < W-1 else 2
    t0 = time.time()
    jx, jy, jz, ovf, bad = _window_kernel(x, y, inf, jnp.asarray(digits[w]),
                                          n=n, lanes=128, r_max=32, repl=repl)
    got = ec.to_affine_host((jx, jy, jz))[0]
    want = g1_msm_host(points, [int(digits[w][i]) % R for i in range(n)])
    assert not bool(ovf) and not bool(bad), (w, bool(ovf), bool(bad))
    assert got == want, f"window {w} mismatch"
    print(f"window {w} (repl={repl}) OK ({time.time()-t0:.0f}s)", flush=True)
print("jnp window path OK", flush=True)
