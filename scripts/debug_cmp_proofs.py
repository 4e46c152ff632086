"""Compare lane 0 of the valid B=4 device proof vs the failing B=32 device
proof field by field — the first differing field pins the broken stage."""
import pickle
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

with open("/tmp/r3cache/proof_B4.pkl", "rb") as f:
    p4 = pickle.load(f)
with open("/tmp/r3cache/proof_B32.pkl", "rb") as f:
    p32 = pickle.load(f)


def cmp(name, a, b):
    a = np.asarray(a)[0]
    b = np.asarray(b)[0]
    if a.shape != b.shape:
        print(f"{name}: SHAPE {a.shape} vs {b.shape}")
        return
    eq = np.array_equal(a, b)
    if not eq:
        d = (a != b)
        print(f"{name}: DIFF {d.sum()}/{d.size} elements, first at {np.argwhere(d)[:3].tolist()}")
    else:
        print(f"{name}: same")


def cmp_pair(name, a, b):
    cmp(name + ".lo", a[0], b[0])
    cmp(name + ".hi", a[1], b[1])


cmp("pis", p4.pis, p32.pis)
cmp_pair("wires_cap", p4.wires_cap, p32.wires_cap)
cmp_pair("zs_cap", p4.zs_cap, p32.zs_cap)
cmp_pair("quotient_cap", p4.quotient_cap, p32.quotient_cap)
for i in range(2):
    cmp_pair(f"openings0[{i}]", p4.openings0[i], p32.openings0[i])
    cmp_pair(f"openings1[{i}]", p4.openings1[i], p32.openings1[i])
fp4, fp32 = p4.fri_proof, p32.fri_proof
for li, (c4, c32) in enumerate(zip(fp4.caps, fp32.caps)):
    cmp_pair(f"fri.caps[{li}]", c4, c32)
cmp_pair("fri.final_coeffs", fp4.final_coeffs, fp32.final_coeffs)
cmp("fri.indices", fp4.indices, fp32.indices)
cmp_pair("fri.pow_witness", fp4.pow_witness, fp32.pow_witness)
for k in p4.initial_leaves:
    cmp_pair(f"initial_leaves[{k}]", p4.initial_leaves[k], p32.initial_leaves[k])
