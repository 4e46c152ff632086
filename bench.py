"""Benchmark harness: batched secp256k1 ECDSA proving throughput per chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Metric: full PLONK+FRI proofs of in-circuit secp256k1 ECDSA verification
(the reference's test_ecdsa_circuit_narrow workload, src/gadgets/ecdsa.rs:163)
produced per second on one chip, steady-state jitted device pipeline.

Baseline anchor (see BASELINE.md "CPU baseline anchor"): the reference
publishes no numbers and no Rust toolchain exists in this image (direct
measurement attempted and impossible), so `vs_baseline` divides by 0.2
proofs/s — the midpoint anchor derived from plonky2's published 170 ms /
2^12-row proving figure scaled to the reference ECDSA circuit's 2^15-2^16
rows on CI-class hardware.

Env knobs: BENCH_BATCH (default: platform-dependent), BENCH_REPS (default 5),
BENCH_SMALL=1 benches the nonnative-mul-chain microcircuit instead,
BENCH_P256=1 benches the P-256 ECDSA circuit (windowed mul path) instead of
secp256k1/GLV.

Every proof in the pipelined stream is verified (after the timed section, so
host-side verification does not distort the device throughput measurement);
any invalid proof aborts the bench.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

RUST_CPU_PROOFS_PER_SEC_EST = 0.2  # documented estimate, BASELINE.md


def main():
    import jax

    platform = jax.devices()[0].platform  # "axon"/"tpu" = real chip, "cpu" = host
    on_device = platform != "cpu"
    reps = int(os.environ.get("BENCH_REPS", "5"))
    small = os.environ.get("BENCH_SMALL") == "1"

    from plonky2_ecdsa_tpu.prover.data import build_circuit_data
    from plonky2_ecdsa_tpu.prover.prover import make_jit_prover
    from plonky2_ecdsa_tpu.prover.verifier import verify

    if small:
        from plonky2_ecdsa_tpu.circuit.examples import nonnative_mul_chain_circuit

        B = int(os.environ.get("BENCH_BATCH", "64" if on_device else "4"))
        b = nonnative_mul_chain_circuit()
        circuit = b.build()
        num_muls = 11
        rng = np.random.default_rng(7)
        from plonky2_ecdsa_tpu.api import int_to_limbs
        from plonky2_ecdsa_tpu.curve import native as cn

        xs = [int.from_bytes(rng.bytes(40), "little") % cn.SECP256K1.p for _ in range(B)]
        ys = [int.from_bytes(rng.bytes(40), "little") % cn.SECP256K1.p for _ in range(B)]
        W = circuit.generate_witness({"x": int_to_limbs(xs), "y": int_to_limbs(ys)}, B)
        pis = circuit.public_input_values()
        data = build_circuit_data(circuit)
        run = make_jit_prover(data)
        proof = run(W, pis)  # compile + warmup
        assert verify(data, proof)
        t0 = time.time()
        for _ in range(reps):
            proof = run(W, pis)
            jax.block_until_ready(proof.openings0)
        dt = (time.time() - t0) / reps
        value = B * num_muls / dt
        print(json.dumps({
            "metric": "nonnative_muls_proved_per_sec_per_chip",
            "value": round(value, 2), "unit": "muls/s",
            "vs_baseline": round(value / (RUST_CPU_PROOFS_PER_SEC_EST * 11), 2),
        }))
        return

    from plonky2_ecdsa_tpu import api
    from plonky2_ecdsa_tpu.curve import native as cn

    if on_device and os.environ.get("BENCH_SKIP_PREFLIGHT") != "1":
        # on-chip miscompile preflight (fail fast BEFORE the timed run):
        # Pallas Poseidon / gl.mul / batch-inverse-scan parity vs numpy —
        # the check classes that caught the r2/r3 TPU miscompiles
        from scripts.tpu_checks import parity_checks

        t0 = time.time()
        parity_checks(log=lambda m: print(f"# preflight {m}", file=sys.stderr),
                      quick=True)
        print(f"# preflight parity checks OK ({time.time()-t0:.1f}s)",
              file=sys.stderr)

    curve = cn.P256 if os.environ.get("BENCH_P256") == "1" else cn.SECP256K1
    # streaming commit + chunked quotient + n=2^14 keep B=32 inside v5e HBM
    B = int(os.environ.get("BENCH_BATCH", "32" if on_device else "1"))
    t0 = time.time()
    system = api.EcdsaProverSystem(curve)
    build_s = time.time() - t0
    t0 = time.time()
    all_stmts = [api.random_statements(curve, B, seed=3 + k)
                 for k in range(reps)]
    stmts_s = time.time() - t0
    t0 = time.time()
    V, pis = system.witness_vals(all_stmts[0])
    wit_s = time.time() - t0
    t0 = time.time()
    data = system.data
    data_s = time.time() - t0
    run = make_jit_prover(data)
    t0 = time.time()
    proof = run.run_vals(V, pis)  # compile + first run
    compile_s = time.time() - t0
    assert system.verify(proof), "bench proof failed verification"

    # steady state: host witness generation for batch k+1 overlaps the
    # device proving batch k (the production serving pipeline shape)
    import threading
    from queue import Queue

    q: Queue = Queue(maxsize=2)

    def producer():
        for stmts in all_stmts:
            q.put(system.witness_vals(stmts))
        q.put(None)

    t0 = time.time()
    th = threading.Thread(target=producer)
    th.start()
    done = 0
    pending = None
    proofs = []
    while True:
        item = q.get()
        if item is None:
            break
        # 2-deep software pipeline: dispatch batch k+1 (async upload+prove)
        # before collecting batch k's proof, so transfer overlaps compute
        handle = run.dispatch_vals(*item)
        if pending is not None:
            proofs.append(run.collect(pending))
            done += 1
        pending = handle
    if pending is not None:
        proofs.append(run.collect(pending))
        done += 1
    th.join()
    dt = (time.time() - t0) / done
    # verify EVERY streamed proof (outside the timed section: host-side
    # verification must not distort the device throughput measurement).
    # NOTE peak host memory is proportional to BENCH_BATCH x BENCH_REPS:
    # every streamed Proof (incl. full FRI query data) is held until the
    # timed loop ends; pop-verify drops each as soon as it is checked.
    i = 0
    while proofs:
        assert system.verify(proofs.pop(0)), \
            f"bench batch {i} proof failed verification"
        i += 1
    value = B / dt
    print(f"# platform={platform} B={B} n={system.n} build={build_s:.1f}s "
          f"witness={wit_s:.1f}s data={data_s:.1f}s compile={compile_s:.1f}s "
          f"steady={dt:.2f}s/batch (pipelined, {done} batches)", file=sys.stderr)
    print(json.dumps({
        "metric": f"{curve.name}_ecdsa_proofs_per_sec_per_chip",
        "value": round(value, 3), "unit": "proofs/s",
        "vs_baseline": round(value / RUST_CPU_PROOFS_PER_SEC_EST, 2),
    }))


if __name__ == "__main__":
    main()
