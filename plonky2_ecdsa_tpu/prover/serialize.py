"""Circuit / prover-data persistence: the build-once / prove-many checkpoint.

The reference's closest checkpoint analogue is circuit serialization — every
gate and witness generator implements serialize/deserialize against
CommonCircuitData so CircuitData can be persisted (SURVEY.md §5;
src/gadgets/biguint.rs:520-548, src/gates/mul_nonnative.rs:181-196).

Here the split is: the *proving* half of CircuitData (fixed polynomials,
Merkle tree, domain tables, gate inventory, PI layout, permutation data) is a
plain tensor/metadata bundle and round-trips through one .npz file; the
*witness tape* is vectorized Python closures, which are deterministic in the
(curve, config) pair and are reattached by rebuilding the template (19 s for
the full ECDSA circuit) — only needed when generating NEW witnesses, not for
proving existing ones or verifying.
"""

from __future__ import annotations

import io
import pickle

import numpy as np

from ..circuit.builder import Circuit, PublicInputLayout
from ..hash import merkle
from .data import CircuitData


def _circuit_meta(circuit: Circuit) -> dict:
    return {
        "config": circuit.config,
        "n": circuit.n,
        "gates": circuit.gates,
        "pi": circuit.pi,
        "k_coeffs": circuit.k_coeffs,
        "num_targets": circuit.num_targets,
        "range_layouts": circuit.range_layouts,
        "derived_tids": circuit.derived_tids,
    }


def save_circuit_data(data: CircuitData, path: str):
    """Persist the proving half of CircuitData to one .npz file."""
    c = data.circuit
    meta = pickle.dumps({
        **_circuit_meta(c),
        "gate_rows": {k: np.asarray(v) for k, v in c.gate_rows.items()},
        "num_constraint_slots": data.num_constraint_slots,
        "perm_slots": data.perm_slots,
        "lookup": data.lookup,
        "lookup_mult_col": c.lookup_mult_col,
        "g": data.g,
        "N": data.N,
        "fixed_cap_height": data.fixed_tree.cap_height,
    })
    arrays = {
        "meta": np.frombuffer(meta, dtype=np.uint8),
        "fixed_values": data.fixed_values,
        "fixed_lde_lo": data.fixed_lde[0], "fixed_lde_hi": data.fixed_lde[1],
        "fixed_coeffs_lo": data.fixed_coeffs[0], "fixed_coeffs_hi": data.fixed_coeffs[1],
        "id_encodings": data.id_encodings,
        "x_lde": data.x_lde,
        "zh_inv_lo": data.zh_inv[0], "zh_inv_hi": data.zh_inv[1],
        "l0_lo": data.l0_lde[0], "l0_hi": data.l0_lde[1],
        "selectors": c.selectors, "constants": c.constants, "sigmas": c.sigmas,
        "row_gate_idx": c.row_gate_idx,
        # wire-position maps: needed by the compact-upload prover path
        "pos_rows": c.pos_rows, "pos_cols": c.pos_cols, "pos_tids": c.pos_tids,
        "pi_tids": c.pi_tids,
    }
    for i, (llo, lhi) in enumerate(data.fixed_tree.levels):
        arrays[f"ftree_lo_{i}"] = llo
        arrays[f"ftree_hi_{i}"] = lhi
    with open(path, "wb") as f:
        np.savez_compressed(f, **arrays)


def load_circuit_data(path: str) -> CircuitData:
    """Load a proving-ready CircuitData.

    The returned object proves witness batches and verifies proofs; its
    `.circuit.tape` is empty — call `attach_template` (or rebuild via
    api.EcdsaProverSystem) before generating new witnesses."""
    z = np.load(path, allow_pickle=False)
    meta = pickle.loads(z["meta"].tobytes())
    levels = []
    i = 0
    while f"ftree_lo_{i}" in z:
        levels.append((z[f"ftree_lo_{i}"], z[f"ftree_hi_{i}"]))
        i += 1
    tree = merkle.MerkleTree(levels=levels, cap_height=meta["fixed_cap_height"])
    circuit = Circuit(
        config=meta["config"],
        n=meta["n"],
        gates=meta["gates"],
        row_gate_idx=z["row_gate_idx"],
        constants=z["constants"],
        sigmas=z["sigmas"],
        selectors=z["selectors"],
        pos_rows=z["pos_rows"] if "pos_rows" in z else np.zeros(0, np.int64),
        pos_cols=z["pos_cols"] if "pos_cols" in z else np.zeros(0, np.int64),
        pos_tids=z["pos_tids"] if "pos_tids" in z else np.zeros(0, np.int64),
        tape=[],
        read_map=np.zeros(0, np.int64),
        num_targets=meta["num_targets"],
        inputs={},
        pi=meta["pi"],
        pi_tids=z["pi_tids"] if "pi_tids" in z else np.zeros(0, np.int64),
        constant_values={},
        k_coeffs=meta["k_coeffs"],
        gate_rows={int(k): np.asarray(v) for k, v in meta["gate_rows"].items()},
        range_layouts=meta.get("range_layouts", {}),
        derived_tids=meta.get("derived_tids", np.zeros(0, np.int64)),
        lookup_mult_col=meta.get("lookup_mult_col"),
    )
    return CircuitData(
        circuit=circuit,
        n=meta["n"],
        N=meta["N"],
        g=meta["g"],
        fixed_values=z["fixed_values"],
        fixed_lde=(z["fixed_lde_lo"], z["fixed_lde_hi"]),
        fixed_tree=tree,
        fixed_coeffs=(z["fixed_coeffs_lo"], z["fixed_coeffs_hi"]),
        id_encodings=z["id_encodings"],
        x_lde=z["x_lde"],
        zh_inv=(z["zh_inv_lo"], z["zh_inv_hi"]),
        l0_lde=(z["l0_lo"], z["l0_hi"]),
        num_constraint_slots=meta["num_constraint_slots"],
        perm_slots=meta["perm_slots"],
        lookup=meta.get("lookup"),
    )


def attach_template(data: CircuitData, built: Circuit):
    """Re-attach a freshly rebuilt template's witness machinery to loaded
    data (shapes must match: same curve/config build)."""
    c = data.circuit
    assert built.n == c.n and len(built.gates) == len(c.gates)
    assert np.array_equal(built.selectors, c.selectors), "template mismatch"
    c.tape = built.tape
    c.pos_rows, c.pos_cols, c.pos_tids = built.pos_rows, built.pos_cols, built.pos_tids
    c.read_map = built.read_map
    c.inputs = built.inputs
    c.pi_tids = built.pi_tids
    c.constant_values = built.constant_values
    c.num_targets = built.num_targets
    return data


def save_proof(proof, path: str):
    """Persist a Proof (plain pickled numpy pytree; serde analogue for
    ECDSASignature etc., reference src/curve/ecdsa.rs:7-23)."""
    import jax

    from .prover import _register_pytrees

    _register_pytrees()
    leaves, treedef = jax.tree_util.tree_flatten(proof)
    leaves = [np.asarray(l) for l in leaves]
    with open(path, "wb") as f:
        pickle.dump((leaves, treedef), f)


def load_proof(path: str):
    import jax

    from .prover import _register_pytrees

    _register_pytrees()
    with open(path, "rb") as f:
        leaves, treedef = pickle.load(f)
    return jax.tree_util.tree_unflatten(treedef, leaves)
