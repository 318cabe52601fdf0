"""Use the golden proof's evaluations at z as a direct scalar oracle for
wire assignment and sigma construction."""
import itertools, sys
sys.path.insert(0, '/root/repo')
from plonkit_tpu.fields import FR_MODULUS as R, get_domain_omega, batch_inverse
from plonkit_tpu.serialization import VerificationKey, Proof
from plonkit_tpu.plonk.verifier import _derive_challenges, batch_evaluate_lagrange_polys

vk = VerificationKey.load('/root/reference/test/circuits/simple/vk.bin')
proof = Proof.load('/root/reference/test/circuits/simple/proof.bin')
N = 8
omega = get_domain_omega(N)
beta, gamma, alpha, z, v, u = _derive_challenges(proof, vk)
Ls = batch_evaluate_lagrange_polys(list(range(N)), N, omega, z)

def ev(values):
    # evaluate the interpolating polynomial at z from its domain values
    return sum(val * L for val, L in zip(values, Ls)) % R

# witness values
y, x, tmp = 35, 3, 9
vv = (x - y + 5) % R  # -27

# wire value hypotheses
a_base = [y, x]
b_base = [0, x]
c_base = [0, tmp]
print('target a(z) b(z) c(z) d(z):', proof.wire_values_at_z)
for add_a, mul1_ab in itertools.product([(y, x, vv), (vv, x, y)], [(tmp, x), (x, tmp)]):
    a = [y, x, add_a[0], mul1_ab[0], 0, 0, 0, 0]
    b = [0, x, add_a[1], mul1_ab[1], 0, 0, 0, 0]
    c = [0, tmp, add_a[2], vv, 0, 0, 0, 0]
    oks = [ev(a) == proof.wire_values_at_z[0], ev(b) == proof.wire_values_at_z[1], ev(c) == proof.wire_values_at_z[2]]
    print(add_a[0], mul1_ab, oks)
print('d(z) zero hypothesis:', ev([0]*8) == proof.wire_values_at_z[3])
# also grand_product eval at z*omega check possible later
