"""Independent re-derivation of the Poseidon round constants from spec.

Clean-room Grain-LFSR implementation per the Poseidon paper (GKRRS19,
Appendix B "Instantiation of round constants" / the reference
generate_parameters_grain.sage), deliberately NOT sharing code with
hash/poseidon.py's generator: this one keeps the 80-bit LFSR state as a
single python int with bitmask taps, so the two derivations agree only if
both implement the spec (VERDICT r3 next #6 — constants reproducible from
spec, not trusted from one implementation).

Parameters (hash/poseidon.py instance): prime field, x^alpha S-box, n=64
field bits, t=12, R_F=8, R_P=22, over the Goldilocks prime.

Usage:
    python scripts/gen_poseidon_constants.py            # verify vs package
    python scripts/gen_poseidon_constants.py --write    # refresh vector file
"""

import json
import os
import sys

P = 0xFFFFFFFF00000001  # Goldilocks
T = 12
FIELD_BITS = 64
R_F = 8
R_P = 22
NUM_CONSTANTS = T * (R_F + R_P)

VEC_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        os.pardir, "tests", "vectors", "poseidon_constants.json")


class Grain:
    """80-bit Grain LFSR, state as an int (bit 79 = oldest / output side).

    Taps per the Poseidon reference: new bit = s62 ^ s51 ^ s38 ^ s23 ^ s13
    ^ s0 (indices from the oldest end); each clock shifts the oldest bit out
    and EMITS THE FEEDBACK BIT (the reference sage's generator yields the
    newly computed bit, not the shifted-out one)."""

    def __init__(self, init_bits):
        assert len(init_bits) == 80
        # store so that init_bits[0] is the oldest bit (shifted out first)
        self.state = 0
        for b in init_bits:
            self.state = (self.state << 1) | b

    def clock(self):
        s = self.state

        def bit(i):  # i-th oldest bit
            return (s >> (79 - i)) & 1

        nb = bit(62) ^ bit(51) ^ bit(38) ^ bit(23) ^ bit(13) ^ bit(0)
        self.state = ((s << 1) & ((1 << 80) - 1)) | nb
        return nb


def init_sequence():
    bits = []

    def push(v, w):
        bits.extend((v >> (w - 1 - i)) & 1 for i in range(w))

    push(1, 2)           # field tag: prime field
    push(0, 4)           # sbox tag: x^alpha
    push(FIELD_BITS, 12)
    push(T, 12)
    push(R_F, 10)
    push(R_P, 10)
    bits.extend([1] * 30)
    return bits


def derive_constants():
    g = Grain(init_sequence())
    for _ in range(160):
        g.clock()

    def sample_bit():
        # shrinking generator: emit the bit after each 1, skip after each 0
        while True:
            first = g.clock()
            second = g.clock()
            if first:
                return second

    out = []
    while len(out) < NUM_CONSTANTS:
        v = 0
        for _ in range(FIELD_BITS):
            v = (v << 1) | sample_bit()
        if v < P:  # rejection sampling into the field
            out.append(v)
    return out


def mds_matrix():
    """The package's circulant+diag MDS as an explicit 12x12 row list
    (structure constants restated here, independent of hash/poseidon.py)."""
    circ = [17, 15, 41, 16, 2, 28, 13, 13, 39, 18, 34, 20]
    diag0 = 8
    return [[(circ[(j - i) % T] + (diag0 if i == j == 0 else 0))
             for j in range(T)] for i in range(T)]


def main():
    rc = derive_constants()
    mds = mds_matrix()
    payload = {
        "params": {"p": str(P), "t": T, "field_bits": FIELD_BITS,
                   "r_f": R_F, "r_p": R_P},
        "round_constants": [str(c) for c in rc],
        "mds": mds,
    }
    if "--write" in sys.argv:
        with open(VEC_PATH, "w") as f:
            json.dump(payload, f, indent=1)
        print(f"wrote {len(rc)} constants -> {VEC_PATH}")
        return
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), os.pardir))
    from plonky2_ecdsa_tpu.hash import poseidon

    assert rc == poseidon.ROUND_CONSTANTS, "round-constant derivation drift"
    pkg_mds = [[(poseidon.MDS_CIRC[(j - i) % T]
                 + (poseidon.MDS_DIAG0 if i == j == 0 else 0))
                for j in range(T)] for i in range(T)]
    assert mds == pkg_mds, "MDS drift"
    print(f"OK: {len(rc)} Grain round constants + MDS match hash/poseidon.py")


if __name__ == "__main__":
    main()
