import itertools, sys
sys.path.insert(0, '/root/repo')
from plonkit_tpu.fields import FR_MODULUS as R, get_domain_omega, batch_inverse
from plonkit_tpu.curve import G1_GEN, g1_mul
from plonkit_tpu.serialization import VerificationKey

vk = VerificationKey.load('/root/reference/test/circuits/simple/vk.bin')
N = 8
omega = get_domain_omega(N)
TAU = 42
van = (pow(TAU, N, R) - 1) % R
dens = [(TAU - pow(omega, i, R)) * N % R for i in range(N)]
inv = batch_inverse(dens, R)
Ls = [van * pow(omega, i, R) % R * inv[i] % R for i in range(N)]

def commit(values):
    acc = 0
    for v, L in zip(values, Ls):
        acc = (acc + v * L) % R
    return g1_mul(G1_GEN, acc)

K = [1, 5, 7, 10]
T_perm = vk.permutation_commitments
D = 'dummy'

best = None
for add_order, mul1_order, pad_var, pad_rows, order, rot in itertools.product(
        [['y','x','v',D], ['v','x','y',D]],
        [['tmp','x','v',D], ['x','tmp','v',D]],
        [D, None], [4, 7, 8], ['rowmajor', 'colmajor'], ['next', 'prev']):
    gates = [
        ['y', D, D, D],
        ['x', 'x', 'tmp', D],
        add_order,
        mul1_order,
    ]
    grid = [list(g) for g in gates]
    while len(grid) < 8:
        grid.append([pad_var] * 4 if len(grid) < pad_rows else [None] * 4)
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
    ok = [commit(sigma[c]) == T_perm[c] for c in range(4)]
    score = sum(ok)
    if score >= 2 or all(ok):
        print(score, add_order[:3], mul1_order[:2], 'pad:', pad_var, pad_rows, order, rot, ok)
