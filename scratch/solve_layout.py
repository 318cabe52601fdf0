"""Scratch: reverse-engineer bellman better_cs gate layout conventions from
the golden vk.bin, exploiting the dev SRS tau=42 (commit(p) = p(42)*G1)."""
import itertools, sys
sys.path.insert(0, '/root/repo')
from plonkit_tpu.fields import FR_MODULUS as R, get_domain_omega, batch_inverse
from plonkit_tpu.curve import G1_GEN, g1_mul
from plonkit_tpu.serialization import VerificationKey

vk = VerificationKey.load('/root/reference/test/circuits/simple/vk.bin')
N = 8
omega = get_domain_omega(N)
TAU = 42

# L_i(tau) for i in 0..8:  L_i(x) = omega^i (x^n - 1) / (n (x - omega^i))
van = (pow(TAU, N, R) - 1) % R
Ls = []
dens = [ (TAU - pow(omega,i,R)) * N % R for i in range(N)]
inv = batch_inverse(dens, R)
for i in range(N):
    Ls.append(van * pow(omega,i,R) % R * inv[i] % R)

def commit(values):
    acc = 0
    for v, L in zip(values, Ls):
        acc = (acc + v*L) % R
    return g1_mul(G1_GEN, acc)

def neg(x): return (-x) % R

# target commitments
T_sel = vk.selector_commitments   # qa qb qc qd qm qconst
T_next = vk.next_step_selector_commitments[0]
T_perm = vk.permutation_commitments

# Hypothesis H1 selectors (rows: input, mul0, add1, mul1, zeros)
def test_selectors(qa, qb, qc, qd, qm, qconst, qdn, tag):
    cands = [commit(qa), commit(qb), commit(qc), commit(qd), commit(qm), commit(qconst)]
    ok = [c == t for c, t in zip(cands, T_sel)]
    nok = commit(qdn) == T_next
    print(tag, ok, nok)
    return all(ok) and nok

z8 = [0]*8
def rows(*vals):
    out = list(vals) + [0]*(8-len(vals))
    return out

# H1: input(qa=-1); mul0: (x,x,tmp) qc=+1 qm=-1; add: (y,x,v) qa=-1 qb=1 qc=-1 qconst=5; mul1: (tmp,x,v) qm=-1 qc=-1
test_selectors(
    qa=rows(neg(1),0,neg(1),0), qb=rows(0,0,1,0), qc=rows(0,1,neg(1),neg(1)),
    qd=z8, qm=rows(0,neg(1),0,neg(1)), qconst=rows(0,0,5,0), qdn=z8, tag='H1')

# H2: same but all signs flipped on constraint gates
test_selectors(
    qa=rows(neg(1),0,1,0), qb=rows(0,0,neg(1),0), qc=rows(0,neg(1),1,1),
    qd=z8, qm=rows(0,1,0,1), qconst=rows(0,0,neg(5),0), qdn=z8, tag='H2')

# H3: input gate qa=+1
test_selectors(
    qa=rows(1,0,neg(1),0), qb=rows(0,0,1,0), qc=rows(0,1,neg(1),neg(1)),
    qd=z8, qm=rows(0,neg(1),0,neg(1)), qconst=rows(0,0,5,0), qdn=z8, tag='H3')

# H4: add gate BEFORE? order input, add, mul0? no mul0 is constraint0. try order: input, mul0, mul1, add
test_selectors(
    qa=rows(neg(1),0,0,neg(1)), qb=rows(0,0,0,1), qc=rows(0,1,neg(1),neg(1)),
    qd=z8, qm=rows(0,neg(1),neg(1),0), qconst=rows(0,0,0,5), qdn=z8, tag='H4')
