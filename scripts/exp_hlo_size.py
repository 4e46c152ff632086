"""Measure traced-module size per prover stage (stop_after bisect)."""
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

cfg = CircuitConfig(
    range_lookup_limb_bits=3,
    fri=FriConfig(rate_bits=2, cap_height=1, num_query_rounds=4,
                  proof_of_work_bits=0),
)
_register_pytrees()
circuit = small_demo_circuit(cfg).build()
data = build_circuit_data(circuit)
W, pis = small_demo_witness(circuit, batch=2)
wires_pair, pi_pair, pis_pair = host_prep(data, W, pis)
bk = Backend(data, jnp)
args = (tuple(jnp.asarray(a) for a in wires_pair),
        tuple(jnp.asarray(a) for a in pi_pair),
        tuple(jnp.asarray(a) for a in pis_pair))

for stage in ["commit", "zs", "quotient", "openings", "fri", None]:
    t0 = time.time()
    jfn = jax.jit(lambda w, p, pv: prove_core(data, bk, w, p, pv, jnp,
                                              stop_after=stage, stream_commit=True))
    lowered = jfn.lower(*args)
    txt = lowered.as_text()
    nops = txt.count("\n")
    print(f"stage={stage}: lower {time.time()-t0:.1f}s, HLO lines={nops}", flush=True)
