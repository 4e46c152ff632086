"""Bisect the zs divergence: compute zs_vals (pre-commit values on H) on the
device at B=32 and B=4 for the same lane-0 witness, and on the host (numpy),
then diff per column.  Also diffs the zs_cap (post-commit) if zs_vals agree."""
import os
import pickle
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from plonky2_ecdsa_tpu.jaxcfg import setup_cache

setup_cache()

import jax
import jax.numpy as jnp

from plonky2_ecdsa_tpu import api
from plonky2_ecdsa_tpu.curve import native as cn
from plonky2_ecdsa_tpu.prover import ntt, prover
from plonky2_ecdsa_tpu.prover.prover import (
    Backend, _register_pytrees, _scatter_maps, host_prep, prover_tables,
    prove_core)

STOP = os.environ.get("STOP", "zs_vals")

system = api.EcdsaProverSystem(cn.SECP256K1)
data = system.data
_register_pytrees()
bk = Backend(data, jnp)
tabs = prover_tables(data, jnp)

z = np.load("/tmp/r3cache/vals_B32.npz")
V32, pis32 = z["V"], z["pis"]
stmts4 = api.random_statements(cn.SECP256K1, 4, seed=3)
W4, pis4 = system.witness(stmts4)


@jax.jit
def jstage(bk, tabs, wires_pair, pi_pair, pis_pair):
    tok = ntt._DEVICE_TABLES.set(tabs)
    try:
        return prove_core(data, bk, wires_pair, pi_pair, pis_pair, jnp,
                          stop_after=STOP)
    finally:
        ntt._DEVICE_TABLES.reset(tok)


def dev_stage(V, pis):
    # W-from-host path (wires verified identical via wires_cap)
    wires_pair, pi_pair, pis_pair = host_prep(data, V, pis)
    wires_pair = (jnp.asarray(wires_pair[0]), jnp.asarray(wires_pair[1]))
    pi_pair = (jnp.asarray(pi_pair[0]), jnp.asarray(pi_pair[1]))
    pis_pair = (jnp.asarray(pis_pair[0]), jnp.asarray(pis_pair[1]))
    t0 = time.time()
    out = jax.device_get(jstage(bk, tabs, wires_pair, pi_pair, pis_pair))
    print(f"  device stage ({wires_pair[0].shape[0]} lanes): {time.time()-t0:.1f}s",
          flush=True)
    return out


# host W for 32 lanes: reuse lane content by regenerating
stmts32 = api.random_statements(cn.SECP256K1, 32, seed=3)
W32, _ = system.witness(stmts32)

out4 = dev_stage(W4, pis4)
out32 = dev_stage(W32, pis32)

bk_np = Backend(data, np)
wp, pip, pisp = host_prep(data, W4, pis4)
t0 = time.time()
host4 = prove_core(data, bk_np, wp, pip, pisp, np, stop_after=STOP)
print(f"  host stage: {time.time()-t0:.1f}s", flush=True)

if STOP == "zs_vals":
    lo4, hi4 = out4
    lo32, hi32 = out32
    hlo, hhi = host4
    k = lo4.shape[1]
    print(f"zs_vals: k={k} columns, n={lo4.shape[2]}")
    bad_d = [c for c in range(k)
             if not (np.array_equal(lo32[0, c], lo4[0, c])
                     and np.array_equal(hi32[0, c], hi4[0, c]))]
    bad_h = [c for c in range(k)
             if not (np.array_equal(lo4[0, c], hlo[0, c])
                     and np.array_equal(hi4[0, c], hhi[0, c]))]
    print(f"dev32 vs dev4 differing columns: {bad_d}")
    print(f"dev4 vs host differing columns: {bad_h}")
    C = data.circuit.config.num_challenges
    nchunks = data.circuit.config.num_routed_wires // data.circuit.config.permutation_chunk_size
    print(f"(perm Z cols: 0..{C*nchunks-1}; lookup cols from {C*nchunks}, "
          f"cols_per_challenge={data.lookup.cols_per_challenge if data.lookup else 0})")
    if bad_d:
        c = bad_d[0]
        d = np.nonzero((lo32[0, c] != lo4[0, c]) | (hi32[0, c] != hi4[0, c]))[0]
        print(f"col {c}: {len(d)} differing rows, first rows {d[:10].tolist()}")
else:
    print("out4 vs out32 lane0:",
          jax.tree_util.tree_map(lambda a, b: np.array_equal(np.asarray(a)[0], np.asarray(b)[0]), out4, out32))
    print("out4 vs host lane0:",
          jax.tree_util.tree_map(lambda a, b: np.array_equal(np.asarray(a)[0], np.asarray(b)), out4, host4))
