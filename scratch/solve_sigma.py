"""Scratch: solve sigma permutation construction conventions against vk.bin."""
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

# cells: gate rows list of 4 wires; variables: named
D = 'dummy'
gates = [
    ['y', D, D, D],          # input gate
    ['x', 'x', 'tmp', D],    # mul0
    ['y', 'x', 'v', D],      # add
    ['tmp', 'x', 'v', D],    # mul1
]

for pad_rows, pad_var, order, rot in itertools.product(
        [7, 8], [D, None], ['rowmajor', 'colmajor'], ['next', 'prev']):
    # build full cell grid: rows x 4 columns -> variable or None (identity)
    grid = [list(g) for g in gates]
    while len(grid) < 8:
        grid.append([pad_var] * 4 if len(grid) < pad_rows else [None] * 4)
    # collect positions per variable
    positions = {}
    if order == 'rowmajor':
        it = [(row, col) for row in range(8) for col in range(4)]
    else:
        it = [(row, col) for col in range(4) for row in range(8)]
    for row, col in it:
        var = grid[row][col]
        if var is not None:
            positions.setdefault(var, []).append((row, col))
    # sigma: start from identity labels, rotate within each cycle
    sigma = [[K[c] * pow(omega, r, R) % R for r in range(8)] for c in range(4)]
    for var, plist in positions.items():
        if len(plist) < 2:
            continue
        labels = [K[c] * pow(omega, r, R) % R for (r, c) in plist]
        if rot == 'next':
            rotated = labels[1:] + labels[:1]
        else:
            rotated = labels[-1:] + labels[:-1]
        for (r, c), lab in zip(plist, rotated):
            sigma[c][r] = lab
    ok = [commit(sigma[c]) == T_perm[c] for c in range(4)]
    if any(ok):
        print(pad_rows, pad_var, order, rot, ok)
