"""Exhaustive MDS check for the Poseidon matrix: a matrix is MDS iff every
square submatrix (all minors, every size) is nonsingular over GF(p).

DP over (row-mask, col-mask) pairs via Laplace expansion along the lowest
set column; ~2.7M minors for 12x12 (~7 s).  Run as a script to print the
verdict; used by tests/test_prover.py::test_poseidon_matrix_is_mds.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from plonky2_ecdsa_tpu.fields.goldilocks import P
from plonky2_ecdsa_tpu.hash.poseidon import MDS_CIRC, MDS_DIAG0, WIDTH


def all_minors_nonzero(verbose: bool = False):
    """True iff every minor of the Poseidon MDS matrix is nonzero mod p."""
    M = [[(MDS_CIRC[(j - i) % WIDTH] + (MDS_DIAG0 if (i == j == 0) else 0)) % P
          for j in range(WIDTH)] for i in range(WIDTH)]
    t0 = time.time()
    by_pop = [[] for _ in range(WIDTH + 1)]
    for m in range(1 << WIDTH):
        by_pop[bin(m).count("1")].append(m)
    bits_of = {m: [i for i in range(WIDTH) if m >> i & 1] for m in range(1 << WIDTH)}
    det = {}
    zero_minor = None
    for k in range(1, WIDTH + 1):
        nd = {}
        for rm in by_pop[k]:
            rbits = bits_of[rm]
            for cm in by_pop[k]:
                c0 = (cm & -cm).bit_length() - 1
                cm2 = cm & (cm - 1)
                if k == 1:
                    d = M[rbits[0]][c0]
                else:
                    d = 0
                    sign = 1
                    for i in rbits:
                        a = M[i][c0]
                        if a:
                            d += sign * a * det[(rm & ~(1 << i), cm2)]
                        sign = -sign
                    d %= P
                nd[(rm, cm)] = d
                if d == 0 and zero_minor is None:
                    zero_minor = (rbits, bits_of[cm])
        det = nd
        if verbose:
            print(f"k={k}: {len(nd)} minors checked, {time.time()-t0:.0f}s",
                  flush=True)
    if verbose:
        print("MDS =", zero_minor is None,
              ("first zero minor: " + str(zero_minor)) if zero_minor else "")
    return zero_minor is None


if __name__ == "__main__":
    ok = all_minors_nonzero(verbose=True)
    sys.exit(0 if ok else 1)
