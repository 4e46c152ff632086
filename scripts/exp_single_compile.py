"""Experiment: single-device jit compile time of prove_core on the demo circuit."""
import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ["PLONKY2_TPU_NO_CACHE"] = "1"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from plonky2_ecdsa_tpu.circuit.config import CircuitConfig, FriConfig
from plonky2_ecdsa_tpu.circuit.examples import small_demo_circuit, small_demo_witness
from plonky2_ecdsa_tpu.prover.data import build_circuit_data
from plonky2_ecdsa_tpu.prover.prover import Backend, host_prep, prove_core, _register_pytrees
from plonky2_ecdsa_tpu.prover.verifier import verify

q = int(sys.argv[1]) if len(sys.argv) > 1 else 12
pw = int(sys.argv[2]) if len(sys.argv) > 2 else 8
stream = bool(int(sys.argv[3])) if len(sys.argv) > 3 else True

cfg = CircuitConfig(
    range_lookup_limb_bits=3,
    fri=FriConfig(rate_bits=2, cap_height=1, num_query_rounds=q,
                  proof_of_work_bits=pw),
)
_register_pytrees()
t0 = time.time()
circuit = small_demo_circuit(cfg).build()
data = build_circuit_data(circuit)
W, pis = small_demo_witness(circuit, batch=2)
wires_pair, pi_pair, pis_pair = host_prep(data, W, pis)
bk = Backend(data, jnp)
t1 = time.time()
print(f"build+data {t1-t0:.1f}s n={data.n}", flush=True)

jfn = jax.jit(lambda w, p, pv: prove_core(data, bk, w, p, pv, jnp, stream_commit=stream))
args = (tuple(jnp.asarray(a) for a in wires_pair),
        tuple(jnp.asarray(a) for a in pi_pair),
        tuple(jnp.asarray(a) for a in pis_pair))
t2 = time.time()
lowered = jfn.lower(*args)
t3 = time.time()
print(f"trace+lower {t3-t2:.1f}s", flush=True)
compiled = lowered.compile()
t4 = time.time()
print(f"compile {t4-t3:.1f}s", flush=True)
proof = compiled(*args)
jax.block_until_ready(proof.openings0)
t5 = time.time()
proof = jax.device_get(proof)
import numpy as np
proof.pis = np.asarray(pis)
print(f"run {t5-t4:.1f}s verify={verify(data, proof)} total={t5-t0:.1f}s", flush=True)
