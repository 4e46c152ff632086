"""Host-side: do the bench's B=32 seed=3 statements satisfy the circuit
constraints?  Distinguishes witness-generation bugs from prover-stage bugs."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from plonky2_ecdsa_tpu import api
from plonky2_ecdsa_tpu.curve import native as cn

system = api.EcdsaProverSystem(cn.SECP256K1)
stmts = api.random_statements(cn.SECP256K1, 32, seed=3)
print("built; checking constraints...", flush=True)
ok = system.check(stmts)
print(f"check(B=32, seed=3): {ok}", flush=True)
if not ok:
    # narrow to the failing lane
    for i, s in enumerate(stmts):
        if not system.check([s]):
            print(f"lane {i} FAILS constraints", flush=True)
