"""Proof verifier (host-side, exact Python-int arithmetic).

plonky2 `verify()` equivalent (SURVEY.md §2.9 "data.verify(proof)"): replays
the Fiat-Shamir transcript, checks the alpha-combined gate + permutation
constraint identity at zeta against the quotient opening, and runs the FRI
query checks (Merkle paths, fold consistency, final-polynomial agreement).
Raises AssertionError with a diagnostic on any failure.
"""

from __future__ import annotations

import numpy as np

from ..circuit.algebra import ExtAlgebra
from ..circuit.gates import PublicInputGate
from ..fields import goldilocks as gl
from ..hash import merkle
from . import fri as fri_mod
from . import ntt
from .challenger import Challenger
from .data import CircuitData
from .prover import Proof

P = gl.P
W = 7  # extension non-residue


# ---- python-int extension arithmetic --------------------------------------

def eadd(a, b):
    return ((a[0] + b[0]) % P, (a[1] + b[1]) % P)


def esub(a, b):
    return ((a[0] - b[0]) % P, (a[1] - b[1]) % P)


def emul(a, b):
    return ((a[0] * b[0] + W * a[1] * b[1]) % P, (a[0] * b[1] + a[1] * b[0]) % P)


def escalar(a, c):
    return (a[0] * c % P, a[1] * c % P)


def einv(a):
    d = (a[0] * a[0] - W * a[1] * a[1]) % P
    di = pow(d, -1, P)
    return (a[0] * di % P, (-a[1]) * di % P)


def epow(a, e):
    r = (1, 0)
    while e:
        if e & 1:
            r = emul(r, a)
        e >>= 1
        a = emul(a, a)
    return r


def _chal_int(ch):
    c = ch.get_challenge()
    return int(gl.to_u64(np.asarray(c[0]), np.asarray(c[1])))


def _chal_ext(ch):
    a = _chal_int(ch)
    b = _chal_int(ch)
    return (a, b)


def _pair_at(pair, index):
    """pair arrays + index tuple -> python int."""
    return int(gl.to_u64(np.asarray(pair[0][index]), np.asarray(pair[1][index])))


def _ext_at(epair, index):
    return (_pair_at(epair[0], index), _pair_at(epair[1], index))


def _to_alg(e):
    """python-int ext -> ExtAlgebra element (0-d pairs)."""
    return (gl.from_int(e[0], ()), gl.from_int(e[1], ()))


def _from_alg(x):
    return (int(gl.to_u64(*x[0])), int(gl.to_u64(*x[1])))


def verify(data: CircuitData, proof: Proof) -> bool:
    """True iff every batch lane's proof verifies (plonky2 data.verify
    equivalent; Result-style bool instead of raising)."""
    try:
        verify_strict(data, proof)
    except (AssertionError, IndexError, ValueError):
        return False
    return True


def verify_strict(data: CircuitData, proof: Proof):
    """Raises AssertionError with a diagnostic on the first failing check."""
    B = proof.pis.shape[0]
    for b in range(B):
        _verify_one(data, proof, b)
    return True


def _cap_at(cap, b):
    lo, hi = cap
    if lo.ndim == 3:
        return lo[b], hi[b]
    return lo, hi


def _verify_one(data: CircuitData, proof: Proof, b: int):
    circuit = data.circuit
    cfg = circuit.config
    n, N = data.n, data.N
    C = cfg.num_challenges
    nr = cfg.num_routed_wires
    chunk = cfg.permutation_chunk_size
    nchunks = nr // chunk
    S = len(circuit.gates)
    nc = cfg.num_constant_cols
    layout = proof.layout
    rate = N // n

    ch = Challenger(np, ())
    ch.observe_cap(data.fixed_tree.cap)
    for i in range(proof.pis.shape[1]):
        ch.observe_u64(proof.pis[b, i])
    ch.observe_cap(_cap_at(proof.wires_cap, b))
    betas, gammas = [], []
    for _ in range(C):
        betas.append(_chal_int(ch))
        gammas.append(_chal_int(ch))
    ch.observe_cap(_cap_at(proof.zs_cap, b))
    alphas = [_chal_int(ch) for _ in range(C)]
    ch.observe_cap(_cap_at(proof.quotient_cap, b))
    zeta = _chal_ext(ch)

    sl = layout.slices()
    opens0 = [_ext_at(proof.openings0, (b, i)) for i in range(layout.total)]
    opens1 = [_ext_at(proof.openings1, (b, i)) for i in range(C)]
    for e in opens0:
        ch.observe_ext(_to_alg(e))
    for e in opens1:
        ch.observe_ext(_to_alg(e))

    fixed_o = opens0[sl["fixed"]]
    wires_o = opens0[sl["wires"]]
    zsp_o = opens0[sl["zs_partials"]]
    quot_o = opens0[sl["quotient"]]
    consts_o = fixed_o[:nc]
    sels_o = fixed_o[nc : nc + S]
    sigmas_o = fixed_o[nc + S : nc + S + nr]

    # ---- constraint identity at zeta --------------------------------------
    zeta_n = epow(zeta, n)
    zh = esub(zeta_n, (1, 0))
    assert zh != (0, 0), "zeta landed in H (negligible probability)"
    l0 = emul(zh, einv(escalar(esub(zeta, (1, 0)), n)))

    # PI column values at zeta
    K = circuit.pi.num_cols
    pi_at_zeta = []
    g = data.g
    for j in range(K):
        acc = (0, 0)
        for blk, row in enumerate(circuit.pi.rows):
            idx = blk * K + j
            if idx < circuit.pi.count:
                grow = pow(g, row, P)
                lrow = emul(zh, einv(escalar(esub(zeta, (grow % P, 0)), n)))
                lrow = escalar(lrow, grow)
                acc = eadd(acc, escalar(lrow, int(proof.pis[b, idx])))
        pi_at_zeta.append(acc)

    # gate constraint terms (slot-major), evaluated in the extension algebra
    alg = ExtAlgebra(np, ())
    wires_alg = [_to_alg(w) for w in wires_o]
    consts_alg = [_to_alg(c) for c in consts_o]
    max_gate_cons = data.num_constraint_slots - data.perm_slots
    gate_terms = [(0, 0)] * max_gate_cons
    for gi, gate in enumerate(circuit.gates):
        if gate.num_constraints == 0:
            continue
        ctx = {}
        if isinstance(gate, PublicInputGate):
            ctx["pi_vals"] = [_to_alg(v) for v in pi_at_zeta]
        cons = gate.eval(alg, wires_alg[: gate.num_wires], consts_alg, ctx)
        sel = sels_o[gi]
        for s, cv in enumerate(cons):
            gate_terms[s] = eadd(gate_terms[s], emul(sel, _from_alg(cv)))

    for c in range(C):
        beta, gamma = betas[c], gammas[c]
        z_zeta = zsp_o[c * nchunks]
        partials = zsp_o[c * nchunks + 1 : c * nchunks + nchunks]
        z_gzeta = opens1[c]
        combined = (0, 0)
        apow = 1  # alpha^slot, alpha is base-field
        alpha = alphas[c]

        def add(term, combined, apow):
            return eadd(combined, escalar(term, apow))

        # slot 0: L0 (Z - 1)
        combined = add(emul(l0, esub(z_zeta, (1, 0))), combined, apow)
        apow = apow * alpha % P
        # chunk products
        for t in range(nchunks):
            F = (1, 0)
            G = (1, 0)
            for j in range(t * chunk, (t + 1) * chunk):
                kj = circuit.k_coeffs[j]
                fj = eadd(eadd(wires_o[j], escalar(zeta, beta * kj % P)), (gamma, 0))
                gj = eadd(eadd(wires_o[j], escalar(sigmas_o[j], beta)), (gamma, 0))
                F = emul(F, fj)
                G = emul(G, gj)
            left = partials[t] if t < nchunks - 1 else z_gzeta
            prev = z_zeta if t == 0 else partials[t - 1]
            combined = add(esub(emul(left, G), emul(prev, F)), combined, apow)
            apow = apow * alpha % P
        # gate slots
        for s in range(max_gate_cons):
            combined = add(gate_terms[s], combined, apow)
            apow = apow * alpha % P

        # quotient recomposition: sum_t zeta^(n t) q_{c,t}(zeta)
        qsum = (0, 0)
        zpow = (1, 0)
        for t in range(rate):
            qsum = eadd(qsum, emul(zpow, quot_o[c * rate + t]))
            zpow = emul(zpow, zeta_n)
        lhs = combined
        rhs = emul(qsum, zh)
        assert lhs == rhs, f"constraint identity fails (batch {b}, challenge {c})"

    # ---- FRI ---------------------------------------------------------------
    fri_alpha = _chal_ext(ch)
    fp = proof.fri_proof
    num_layers, final_size, _nf = fri_mod.plan(N, cfg)
    tables, final_shift = fri_mod._domain_tables(N, num_layers)
    fri_betas = []
    for li in range(num_layers):
        ch.observe_cap(_cap_at(fp.caps[li], b))
        fri_betas.append(_chal_ext(ch))
    nfinal = _nf
    final_coeffs = [
        (_pair_at((fp.final_coeffs[0][0][b], fp.final_coeffs[0][1][b]), (k,)),
         _pair_at((fp.final_coeffs[1][0][b], fp.final_coeffs[1][1][b]), (k,)))
        for k in range(nfinal)
    ]
    for k in range(nfinal):
        ch.observe_ext(_to_alg(final_coeffs[k]))
    idx_arrays = ch.get_indices(N, cfg.fri.num_query_rounds)
    indices = [int(ix) for ix in idx_arrays]
    assert indices == [int(v) for v in fp.indices[b]], "query indices mismatch"

    gz = emul(zeta, (data.g, 0))
    n0 = layout.total
    tree_caps = {
        "fixed": data.fixed_tree.cap,
        "wires": _cap_at(proof.wires_cap, b),
        "zs": _cap_at(proof.zs_cap, b),
        "quot": _cap_at(proof.quotient_cap, b),
    }
    tree_order = ["fixed", "wires", "zs", "quot"]
    G_N = pow(gl.POWER_OF_TWO_GENERATOR, (1 << 32) // N, P)

    for qi, idx in enumerate(indices):
        # initial tree openings
        leaf_vals = []
        for name in tree_order:
            llo, lhi = proof.initial_leaves[name]
            plo, phi = proof.initial_paths[name]
            leaf_lo = np.asarray(llo[b, qi])
            leaf_hi = np.asarray(lhi[b, qi])
            ok = merkle.verify_merkle_proof(
                leaf_lo, leaf_hi, idx, np.asarray(plo[b, qi]), np.asarray(phi[b, qi]),
                np.asarray(tree_caps[name][0] if tree_caps[name][0].ndim == 2 else tree_caps[name][0]),
                np.asarray(tree_caps[name][1]),
            )
            assert ok, f"initial merkle proof fails: {name} q{qi} (batch {b})"
            leaf_vals.extend(int(v) for v in gl.to_u64(leaf_lo, leaf_hi))
        assert len(leaf_vals) == layout.total
        x = ntt.COSET_SHIFT * pow(G_N, idx, P) % P
        red0 = (0, 0)
        apow = (1, 0)
        for v, y in zip(leaf_vals, opens0):
            red0 = eadd(red0, emul(apow, esub((v, 0), y)))
            apow = emul(apow, fri_alpha)
        Fv = emul(red0, einv(esub((x, 0), zeta)))
        red1 = (0, 0)
        apow1 = (1, 0)
        for c in range(C):
            vz = leaf_vals[sl["zs_partials"].start + c * nchunks]
            red1 = eadd(red1, emul(apow1, esub((vz, 0), opens1[c])))
            apow1 = emul(apow1, fri_alpha)
        Fv = eadd(Fv, emul(apow, emul(red1, einv(esub((x, 0), gz)))))

        # fold layers
        cur_idx = idx
        for li, (shift, gen, _inv2x) in enumerate(tables):
            size = N >> li
            half = size // 2
            j = cur_idx % half
            llo, lhi = fp.layer_leaves[li]
            leaf_lo = np.asarray(llo[b, qi])
            leaf_hi = np.asarray(lhi[b, qi])
            vals = [int(v) for v in gl.to_u64(leaf_lo, leaf_hi)]
            a_val = (vals[0], vals[1])
            b_val = (vals[2], vals[3])
            expect = a_val if cur_idx < half else b_val
            assert expect == Fv, f"FRI fold mismatch layer {li} q{qi} (batch {b})"
            plo, phi = fp.layer_paths[li]
            ok = merkle.verify_merkle_proof(
                leaf_lo, leaf_hi, j, np.asarray(plo[b, qi]), np.asarray(phi[b, qi]),
                np.asarray(_cap_at(fp.caps[li], b)[0]), np.asarray(_cap_at(fp.caps[li], b)[1]))
            assert ok, f"FRI layer merkle fails layer {li} q{qi}"
            xj = shift * pow(gen, j, P) % P
            beta = fri_betas[li]
            s_val = eadd(a_val, b_val)
            d_val = esub(a_val, b_val)
            inv2 = pow(2, -1, P)
            Fv = eadd(escalar(s_val, inv2),
                      emul(beta, escalar(d_val, pow(2 * xj % P, -1, P))))
            cur_idx = j
        # final polynomial
        size = N >> num_layers
        gfin = pow(gl.POWER_OF_TWO_GENERATOR, (1 << 32) // size, P)
        xfin = final_shift * pow(gfin, cur_idx, P) % P
        acc = (0, 0)
        xp = 1
        for coef in final_coeffs:
            acc = eadd(acc, escalar(coef, xp))
            xp = xp * xfin % P
        assert acc == Fv, f"FRI final polynomial mismatch q{qi} (batch {b})"
