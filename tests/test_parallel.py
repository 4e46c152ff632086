"""Mesh-sharded prover tests on the 8-virtual-device CPU backend
(SURVEY.md §4 TPU-build implication d: multi-host simulated via
--xla_force_host_platform_device_count)."""

import numpy as np
import pytest

from plonky2_ecdsa_tpu.circuit.examples import small_demo_circuit, small_demo_witness
from plonky2_ecdsa_tpu.parallel.mesh import make_mesh_prover, prover_mesh
from plonky2_ecdsa_tpu.prover.data import build_circuit_data
from plonky2_ecdsa_tpu.prover.prover import prove
from plonky2_ecdsa_tpu.prover.verifier import verify


@pytest.mark.slow
def test_mesh_prover_verifies_and_matches_host():
    import jax

    assert len(jax.devices()) >= 8
    circuit = small_demo_circuit().build()
    data = build_circuit_data(circuit)
    B = 8
    W, pis = small_demo_witness(circuit, batch=B)

    mesh = prover_mesh(8, col_parallel=2)
    assert dict(mesh.shape) == {"dp": 4, "col": 2}
    run = make_mesh_prover(data, mesh)
    proof = run(W, pis)
    assert verify(data, proof)

    host_proof = prove(data, W, pis)
    # sharded and host pipelines must agree bit-exactly
    assert np.array_equal(np.asarray(proof.openings0[0][0]), host_proof.openings0[0][0])
    assert np.array_equal(np.asarray(proof.wires_cap[0]), host_proof.wires_cap[0])
    for (lo, hi), (hlo, hhi) in zip(proof.fri_proof.caps, host_proof.fri_proof.caps):
        assert np.array_equal(np.asarray(lo), hlo)


@pytest.mark.slow
def test_graft_entry_dryrun():
    import sys
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


@pytest.mark.slow
def test_graft_entry_compiles():
    import sys
    sys.path.insert(0, "/root/repo")
    import jax

    import __graft_entry__ as ge

    fn, args = ge.entry()
    jax.jit(fn).lower(*args).compile()
