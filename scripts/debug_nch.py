"""CPU experiment: does forcing the chunked quotient/reduced-poly path
(nch=2, normally device-only at N>=2^15) break verification on a small
circuit?  Exercises the exact fori_loop chunk logic full-scale proving hits."""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from plonky2_ecdsa_tpu.prover import prover
from plonky2_ecdsa_tpu.prover.data import build_circuit_data
from plonky2_ecdsa_tpu.prover.verifier import verify_strict, VerifyError
from plonky2_ecdsa_tpu.circuit.examples import (
    nonnative_mul_chain_circuit, small_demo_circuit, small_demo_witness)
from plonky2_ecdsa_tpu.circuit.config import CircuitConfig


def try_prove(nch_force, stream):
    prover._quotient_num_chunks = lambda N, xp: (
        nch_force if xp is not np else 1)
    b = small_demo_circuit()
    circuit = b.build()
    W, pis = small_demo_witness(circuit, 2)
    data = build_circuit_data(circuit)
    run = prover.make_jit_prover(data)
    proof = run(W, pis)
    try:
        verify_strict(data, proof)
        return "OK"
    except (VerifyError, AssertionError) as e:
        return f"FAIL: {e}"


orig = prover._quotient_num_chunks
for nch in (1, 2, 4):
    print(f"nch={nch}: {try_prove(nch, True)}", flush=True)
