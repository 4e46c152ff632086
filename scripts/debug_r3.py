"""Round-3 debug: reproduce the full-scale TPU verification failure and name
the first failing check via verify_strict.

Usage: python scripts/debug_r3.py [B]
Caches witness vals + proof to /tmp/r3cache for fast iteration.
"""
import os
import pickle
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

CACHE = "/tmp/r3cache"
os.makedirs(CACHE, exist_ok=True)


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    import jax
    print(f"platform={jax.devices()[0].platform} B={B}", flush=True)

    from plonky2_ecdsa_tpu import api
    from plonky2_ecdsa_tpu.curve import native as cn
    from plonky2_ecdsa_tpu.prover.prover import make_jit_prover
    from plonky2_ecdsa_tpu.prover.verifier import verify_strict, VerifyError

    t0 = time.time()
    system = api.EcdsaProverSystem(cn.SECP256K1)
    print(f"build: {time.time()-t0:.1f}s n={system.n}", flush=True)

    wit_path = f"{CACHE}/vals_B{B}.npz"
    if os.path.exists(wit_path):
        z = np.load(wit_path)
        V, pis = z["V"], z["pis"]
        print("witness: cached", flush=True)
    else:
        stmts = api.random_statements(cn.SECP256K1, B, seed=3)
        t0 = time.time()
        V, pis = system.witness_vals(stmts)
        print(f"witness: {time.time()-t0:.1f}s", flush=True)
        np.savez(wit_path, V=V, pis=pis)

    data = system.data
    run = make_jit_prover(data)
    t0 = time.time()
    proof = run.run_vals(V, pis)
    print(f"prove(compile+run): {time.time()-t0:.1f}s", flush=True)
    with open(f"{CACHE}/proof_B{B}.pkl", "wb") as f:
        pickle.dump(proof, f)

    try:
        verify_strict(data, proof)
        print("VERIFY OK (bug did not reproduce at this config)", flush=True)
    except VerifyError as e:
        print(f"VERIFY FAILED: {e}", flush=True)
    except AssertionError as e:
        print(f"VERIFY FAILED (assert): {e}", flush=True)


if __name__ == "__main__":
    main()
