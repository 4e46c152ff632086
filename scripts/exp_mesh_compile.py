"""Experiment: time the mesh-prover XLA compile under different configs.

Usage: JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
       python scripts/exp_mesh_compile.py <col> <queries> <pow>
"""
import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ["PLONKY2_TPU_NO_CACHE"] = "1"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

from plonky2_ecdsa_tpu.circuit.config import CircuitConfig, FriConfig
from plonky2_ecdsa_tpu.circuit.examples import small_demo_circuit, small_demo_witness
from plonky2_ecdsa_tpu.parallel.mesh import make_mesh_prover, prover_mesh
from plonky2_ecdsa_tpu.prover.data import build_circuit_data
from plonky2_ecdsa_tpu.prover.verifier import verify

col = int(sys.argv[1]) if len(sys.argv) > 1 else 2
q = int(sys.argv[2]) if len(sys.argv) > 2 else 12
pw = int(sys.argv[3]) if len(sys.argv) > 3 else 8

cfg = CircuitConfig(
    range_lookup_limb_bits=3,
    fri=FriConfig(rate_bits=2, cap_height=1, num_query_rounds=q,
                  proof_of_work_bits=pw),
)
t0 = time.time()
mesh = prover_mesh(8, col_parallel=col)
circuit = small_demo_circuit(cfg).build()
data = build_circuit_data(circuit)
B = 2 * mesh.shape["dp"]
W, pis = small_demo_witness(circuit, batch=B)
t1 = time.time()
print(f"build+data {t1-t0:.1f}s n={data.n}", flush=True)
run = make_mesh_prover(data, mesh)
proof = run(W, pis)
t2 = time.time()
print(f"compile+run {t2-t1:.1f}s", flush=True)
ok = verify(data, proof)
print(f"verify={ok} total={time.time()-t0:.1f}s mesh={dict(mesh.shape)}", flush=True)
