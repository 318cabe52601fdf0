import itertools, sys
sys.path.insert(0, '/root/repo')
from plonkit_tpu.fields import FR_MODULUS as P

TARGET = 7853200120776062878684798364095072458815029376092732009249414926327459813530
RF, RP, t = 8, 57, 3

class Grain:
    def __init__(self, nbits, rev_init, taps=(62,51,38,23,13,0)):
        bits = []
        for value, width in ((1,2),(0,4),(nbits,12),(t,12),(RF,10),(RP,10),((1<<30)-1,30)):
            b = [(value >> (width-1-i)) & 1 for i in range(width)]
            bits += b
        if rev_init:
            bits = bits[::-1]
        self.state = bits
        self.taps = taps
        for _ in range(160):
            self._raw()
    def _raw(self):
        s = self.state
        new = 0
        for tp in self.taps: new ^= s[tp]
        self.state = s[1:]+[new]
        return new
    def bit(self, inv):
        # pairs mode: always consume bits in pairs; emit second iff first==1
        while True:
            b1 = self._raw()
            b2 = self._raw()
            if (b1 == 0) if inv else (b1 == 1):
                return b2
    def field(self, nbits, inv, lsb):
        while True:
            bits = [self.bit(inv) for _ in range(nbits)]
            if lsb: bits = bits[::-1]
            v = 0
            for b in bits: v = (v<<1)|b
            if v < P: return v

def perm(state, C, M, transM):
    n_rounds = RF + RP
    for r in range(n_rounds):
        state = [(x + C[r*t+i]) % P for i,x in enumerate(state)]
        full = r < RF//2 or r >= n_rounds - RF//2
        if full:
            state = [pow(x,5,P) for x in state]
        else:
            state[0] = pow(state[0],5,P)
        if transM:
            state = [sum(M[j][i]*state[j] for j in range(t)) % P for i in range(t)]
        else:
            state = [sum(M[i][j]*state[j] for j in range(t)) % P for i in range(t)]
    return state

for nbits, rev_init, inv, lsb, mds_mode, transM, plusminus in itertools.product(
        (254, 255), (False, True), (False, True), (False,), 
        ("cont", "fresh"), (False, True), ("plus", "minus")):
    g = Grain(nbits, rev_init)
    C = [g.field(nbits, inv, lsb) for _ in range((RF+RP)*t)]
    if mds_mode == "fresh":
        g2 = Grain(nbits, rev_init)
        xs = [g2.field(nbits, inv, lsb) for _ in range(t)]
        ys = [g2.field(nbits, inv, lsb) for _ in range(t)]
    else:
        xs = [g.field(nbits, inv, lsb) for _ in range(t)]
        ys = [g.field(nbits, inv, lsb) for _ in range(t)]
    if plusminus == "plus":
        M = [[pow((xs[i]+ys[j]) % P, P-2, P) for j in range(t)] for i in range(t)]
    else:
        M = [[pow((xs[i]-ys[j]) % P, P-2, P) for j in range(t)] for i in range(t)]
    out = perm([0,1,2], C, M, transM)[0]
    if out == TARGET:
        print("MATCH:", nbits, rev_init, inv, lsb, mds_mode, transM, plusminus)
        break
else:
    print("no match in search space")
