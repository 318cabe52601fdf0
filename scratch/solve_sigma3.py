import itertools, sys
sys.path.insert(0, '/root/repo')
from plonkit_tpu.fields import FR_MODULUS as R, get_domain_omega, batch_inverse
from plonkit_tpu.curve import G1_GEN, g1_mul
from plonkit_tpu.serialization import VerificationKey, Proof
from plonkit_tpu.plonk.verifier import _derive_challenges, batch_evaluate_lagrange_polys

vk = VerificationKey.load('/root/reference/test/circuits/simple/vk.bin')
proof = Proof.load('/root/reference/test/circuits/simple/proof.bin')
N = 8
omega = get_domain_omega(N)
TAU = 42
beta, gamma, alpha, z, v, u = _derive_challenges(proof, vk)
Lz = batch_evaluate_lagrange_polys(list(range(N)), N, omega, z)

van = (pow(TAU, N, R) - 1) % R
dens = [(TAU - pow(omega, i, R)) * N % R for i in range(N)]
inv = batch_inverse(dens, R)
Lt = [van * pow(omega, i, R) % R * inv[i] % R for i in range(N)]

def commit(values):
    return g1_mul(G1_GEN, sum(val * L for val, L in zip(values, Lt)) % R)

def ev(values):
    return sum(val * L for val, L in zip(values, Lz)) % R

K = [1, 5, 7, 10]
T_perm = vk.permutation_commitments
D = None  # dummy cells: excluded from partitions -> identity
y, x, tmp = 'y', 'x', 'tmp'
gates = [
    ['y', D, D, D],
    ['x', 'x', 'tmp', D],
    ['y', 'x', 'v', D],
    ['tmp', 'x', 'v', D],
]

targets_z = proof.permutation_polynomials_at_z

for pad_rows, order, rot in itertools.product([4, 7, 8], ['rowmajor', 'colmajor'], ['next', 'prev']):
    grid = [list(g) for g in gates]
    while len(grid) < 8:
        grid.append([D] * 4)
    positions = {}
    if order == 'rowmajor':
        it = [(row, col) for row in range(8) for col in range(4)]
    else:
        it = [(row, col) for col in range(4) for row in range(8)]
    for row, col in it:
        var = grid[row][col]
        if var is not None:
            positions.setdefault(var, []).append((row, col))
    sigma = [[K[c] * pow(omega, r, R) % R for r in range(8)] for c in range(4)]
    for var, plist in positions.items():
        if len(plist) < 2:
            continue
        labels = [K[c] * pow(omega, r, R) % R for (r, c) in plist]
        rotated = labels[1:] + labels[:1] if rot == 'next' else labels[-1:] + labels[:-1]
        for (r, c), lab in zip(plist, rotated):
            sigma[c][r] = lab
    ok_z = [ev(sigma[c]) == targets_z[c] for c in range(3)]
    ok_c = [commit(sigma[c]) == T_perm[c] for c in range(4)]
    print(pad_rows, order, rot, 'evals:', ok_z, 'comms:', ok_c)
