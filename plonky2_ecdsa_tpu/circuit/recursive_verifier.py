"""Recursive-verifier skeleton: the PLONK constraint identity at zeta,
re-evaluated IN-CIRCUIT from a proof's claimed openings.

This consumes the recursion surface (Gate.eval_circuit /
circuit.recursion.CircuitExtAlgebra) the way plonky2's recursive verifier
consumes `eval_unfiltered_circuit` (reference: src/gates/mul_nonnative.rs:
132-166 exists precisely so an outer circuit can re-evaluate the gate's
constraints over `ExtensionTarget<D>`).  Scope (VERDICT r2 next #8): the
heavy algebraic half of verification — gate terms, permutation grand-product
terms, LogUp lookup terms, alpha folding, quotient recombination, L0/PI
interpolation — is constrained in-circuit, with the proof's openings and
challenges bound as public inputs; the FRI query phase (Merkle paths,
fold consistency, PoW) stays native for now.

Mirrors prover/verifier.py verify_strict's "constraint identity at zeta"
block statement-for-statement; tests/test_recursion_surface.py checks the
in-circuit identity accepts exactly the proofs the native verifier accepts.
"""

from __future__ import annotations

import numpy as np

from ..fields.goldilocks import P
from ..prover.data import CircuitData
from .gates import PublicInputGate
from .recursion import CircuitExtAlgebra, ExtTarget, add_virtual_ext
from .witness import ginv, gmul, gmul_const, gneg, gsub

W_EXT = 7


def ext_mul_base(b, e: ExtTarget, t: int) -> ExtTarget:
    """ExtTarget * base-field target (coordinate-wise)."""
    return ExtTarget(b.mul(e[0], t), b.mul(e[1], t))


def ext_inverse_circuit(b, e: ExtTarget) -> ExtTarget:
    """Hint + check in-circuit GF(p^2) inverse: allocate inv, fill it on the
    host, constrain e * inv == 1 (the gadget-wide hint pattern, SURVEY §3.5;
    an all-zero e makes the row unsatisfiable, as for base-field inv)."""
    inv = add_virtual_ext(b)

    def fill(ev, c0=e[0], c1=e[1], o=np.array([inv[0], inv[1]])):
        x0 = ev.get(np.array([c0]))[0]
        x1 = ev.get(np.array([c1]))[0]
        nrm = gsub(gmul(x0, x0), gmul_const(gmul(x1, x1), W_EXT))
        ninv = ginv(nrm)
        ev.set(o, np.stack([gmul(x0, ninv), gmul(gneg(x1), ninv)]))

    b.add_op(fill, [inv[0], inv[1]], "ext_inv")
    alg = CircuitExtAlgebra(b)
    prod = alg.mul(e, inv)
    b.assert_one(prod[0])
    b.assert_zero(prod[1])
    return inv


def ext_pow_const_circuit(b, e: ExtTarget, k: int) -> ExtTarget:
    alg = CircuitExtAlgebra(b)
    r = None
    base = e
    while k:
        if k & 1:
            r = base if r is None else alg.mul(r, base)
        k >>= 1
        if k:
            base = alg.mul(base, base)
    return r if r is not None else alg.one()


def add_constraint_identity_check(b, data: CircuitData):
    """Build the in-circuit constraint-identity check for proofs of `data`.

    Allocates virtual targets for the proof openings and challenges,
    registers them as both named inputs (for witness feeding) and public
    inputs (the binding an outer composition layer would consume), and emits
    constraints enforcing

        sum_slots alpha_c^slot * constraint_slot(openings, challenges)
            == Z_H(zeta) * sum_t zeta^(t n) quotient_{c,t}(zeta)

    for every challenge copy c.  Returns the input-name -> target-list dict
    (layout documented per key)."""
    circuit = data.circuit
    cfg = circuit.config
    n = data.n
    N = data.N
    C = cfg.num_challenges
    nr = cfg.num_routed_wires
    chunk = cfg.permutation_chunk_size
    nchunks = nr // chunk
    S = len(circuit.gates)
    nc = cfg.num_constant_cols
    rate = N // n
    lk = data.lookup
    alg = CircuitExtAlgebra(b)

    num_fixed = data.fixed_values.shape[0]
    cpc = lk.cols_per_challenge if lk is not None else 0
    num_zs = C * nchunks + C * cpc
    total = num_fixed + cfg.num_wires + num_zs + C * rate
    nz1 = 2 * C if lk is not None else C

    def ext_vec(name, k):
        es = [add_virtual_ext(b) for _ in range(k)]
        flat = [t for e in es for t in e]
        b.register_input(name, flat)
        b.register_public_inputs(flat)
        return es

    def base_vec(name, k):
        ts = b.add_virtual_targets(k)
        b.register_input(name, ts)
        b.register_public_inputs(ts)
        return ts

    open0 = ext_vec("open0", total)           # layout order: fixed|wires|zs|quot
    open1 = ext_vec("open1", nz1)             # Z polys at g*zeta
    zeta = ext_vec("zeta", 1)[0]
    alphas = base_vec("alphas", C)
    betas = base_vec("betas", C)
    gammas = base_vec("gammas", C)
    lk_alphas = base_vec("lk_alphas", C) if lk is not None else []
    pis = base_vec("pis", circuit.pi.count)

    o_fixed = 0
    o_wires = num_fixed
    o_zs = o_wires + cfg.num_wires
    o_quot = o_zs + num_zs

    one = alg.one()
    zeta_n = ext_pow_const_circuit(b, zeta, n)
    zh = alg.sub(zeta_n, one)
    nconst = b.constant(n % P)
    # L0(zeta) = zh / (n (zeta - 1))
    l0 = alg.mul(zh, ext_inverse_circuit(
        b, ext_mul_base(b, alg.sub(zeta, one), nconst)))

    # PI column values at zeta (Lagrange over the PI gate rows)
    K = circuit.pi.num_cols
    g = data.g
    pi_at_zeta = []
    for j in range(K):
        acc = alg.zero()
        for blk, row in enumerate(circuit.pi.rows):
            idx = blk * K + j
            if idx < circuit.pi.count:
                grow = pow(g, row, P)
                lrow = alg.mul(zh, ext_inverse_circuit(
                    b, ext_mul_base(b, alg.sub(zeta, alg.const(grow)), nconst)))
                lrow = alg.mul_const(lrow, grow)
                acc = alg.add(acc, ext_mul_base(b, lrow, pis[idx]))
        pi_at_zeta.append(acc)

    wires_o = [open0[o_wires + j] for j in range(cfg.num_wires)]
    consts_o = [open0[o_fixed + j] for j in range(nc)]
    sels = [open0[o_fixed + nc + gi] for gi in range(S)]
    sigmas = [open0[o_fixed + nc + S + j] for j in range(nr)]
    zsp = [open0[o_zs + j] for j in range(num_zs)]
    quot = [open0[o_quot + j] for j in range(C * rate)]

    # gate terms, summed over gates weighted by their selector openings
    max_gate_cons = (data.num_constraint_slots - data.perm_slots
                     - (lk.slots if lk is not None else 0))
    gate_terms = [alg.zero()] * max_gate_cons
    for gi, gate in enumerate(circuit.gates):
        if gate.num_constraints == 0:
            continue
        ctx = {}
        if isinstance(gate, PublicInputGate):
            ctx["pi_vals"] = pi_at_zeta
        cons = gate.eval_circuit(b, wires_o[: gate.num_wires], consts_o, ctx)
        for s, cv in enumerate(cons):
            gate_terms[s] = alg.add(gate_terms[s], alg.mul(sels[gi], cv))

    for c in range(C):
        beta, gamma = betas[c], gammas[c]
        z_zeta = zsp[c * nchunks]
        partials = zsp[c * nchunks + 1 : c * nchunks + nchunks]
        z_gzeta = open1[c]
        combined = alg.zero()
        apow = b.one()  # alpha^slot, base field
        alpha = alphas[c]

        def fold(term, combined, apow):
            return alg.add(combined, ext_mul_base(b, term, apow)), \
                b.mul(apow, alpha)

        combined, apow = fold(alg.mul(l0, alg.sub(z_zeta, one)), combined, apow)
        for t in range(nchunks):
            F = one
            G = one
            for j in range(t * chunk, (t + 1) * chunk):
                kj = circuit.k_coeffs[j]
                bk = b.mul_const(kj % P, beta)
                gamma_j = ExtTarget(gamma, b.zero())
                fj = alg.add(alg.add(wires_o[j], ext_mul_base(b, zeta, bk)),
                             gamma_j)
                gj = alg.add(alg.add(wires_o[j],
                                     ext_mul_base(b, sigmas[j], beta)), gamma_j)
                F = alg.mul(F, fj)
                G = alg.mul(G, gj)
            left = partials[t] if t < nchunks - 1 else z_gzeta
            prev = z_zeta if t == 0 else partials[t - 1]
            combined, apow = fold(alg.sub(alg.mul(left, G), alg.mul(prev, F)),
                                  combined, apow)
        for s in range(max_gate_cons):
            combined, apow = fold(gate_terms[s], combined, apow)

        if lk is not None:
            nb = lk.num_batches
            BSZ = 3
            zoff = C * nchunks + c * cpc
            alpha_lk = ExtTarget(lk_alphas[c], b.zero())
            t_open = open0[o_fixed + lk.table_idx]
            m_open = wires_o[lk.mult_col]
            h_tab = zsp[zoff + nb]
            combined, apow = fold(alg.sub(alg.mul(
                h_tab, alg.sub(alpha_lk, t_open)), m_open), combined, apow)
            gate_ds = []
            for gi, g_ in lk.gates:
                colsg, scalesg = g_.lookup_cols_scales(nb)
                ds = [alg.sub(alpha_lk, alg.mul_const(wires_o[col], scale))
                      for col, scale in zip(colsg, scalesg)]
                gate_ds.append((sels[gi], ds))
            hsum = alg.zero()
            selsum = alg.zero()
            for sel, _ds in gate_ds:
                selsum = alg.add(selsum, sel)
            for bi in range(nb):
                hb = zsp[zoff + bi]
                hsum = alg.add(hsum, hb)
                slot_val = alg.zero()
                for sel, ds in gate_ds:
                    d0, d1, d2 = ds[bi * BSZ : bi * BSZ + BSZ]
                    d01 = alg.mul(d0, d1)
                    D = alg.mul(d01, d2)
                    Nv = alg.add(d01, alg.mul(alg.add(d0, d1), d2))
                    slot_val = alg.add(slot_val, alg.mul(
                        sel, alg.sub(alg.mul(hb, D), Nv)))
                combined, apow = fold(slot_val, combined, apow)
            zlk = zsp[zoff + nb + 1]
            zlk_g = open1[C + c]
            step = alg.add(alg.sub(alg.sub(zlk_g, zlk),
                                   alg.mul(selsum, hsum)), h_tab)
            combined, apow = fold(step, combined, apow)
            combined, apow = fold(alg.mul(l0, zlk), combined, apow)

        qsum = alg.zero()
        zpow = one
        for t in range(rate):
            qsum = alg.add(qsum, alg.mul(zpow, quot[c * rate + t]))
            zpow = alg.mul(zpow, zeta_n)
        rhs = alg.mul(qsum, zh)
        b.connect(combined[0], rhs[0])
        b.connect(combined[1], rhs[1])

    return {"open0": open0, "open1": open1, "zeta": zeta, "alphas": alphas,
            "betas": betas, "gammas": gammas, "lk_alphas": lk_alphas,
            "pis": pis, "total": total}


def derive_challenges(data: CircuitData, proof):
    """Replay the verifier transcript up to zeta via the SHARED helper
    (prover.verifier.replay_challenges_to_zeta — one source of truth for the
    schedule prefix, ADVICE r3).  Returns per-lane u64 arrays for feeding the
    in-circuit identity check."""
    from ..fields import goldilocks as gl
    from ..prover.verifier import replay_challenges_to_zeta

    B = proof.pis.shape[0]
    (_ch, betas, gammas, lk_alphas, alphas, zeta,
     _z_idx) = replay_challenges_to_zeta(data, proof)
    u64 = lambda p: gl.to_u64(*p)
    return {
        "betas": np.stack([u64(x) for x in betas], 1),
        "gammas": np.stack([u64(x) for x in gammas], 1),
        "lk_alphas": (np.stack([u64(x) for x in lk_alphas], 1)
                      if lk_alphas else np.zeros((B, 0), np.uint64)),
        "alphas": np.stack([u64(x) for x in alphas], 1),
        "zeta": np.stack([u64(zeta[0]), u64(zeta[1])], 1),
    }


def verifier_inputs_from_proof(data: CircuitData, proof) -> dict:
    """Proof -> witness-input dict for the circuit built by
    add_constraint_identity_check (ext values interleaved (c0, c1))."""
    from ..fields import goldilocks as gl

    chs = derive_challenges(data, proof)

    def inter(ext_pair):
        # ext pair ((lo0,hi0),(lo1,hi1)) of [B, K] -> [B, 2K] u64 interleaved
        a = gl.to_u64(*ext_pair[0])
        c = gl.to_u64(*ext_pair[1])
        B, K = a.shape
        out = np.zeros((B, 2 * K), np.uint64)
        out[:, 0::2] = a
        out[:, 1::2] = c
        return out

    return {
        "open0": inter(proof.openings0),
        "open1": inter(proof.openings1),
        "zeta": chs["zeta"],
        "alphas": chs["alphas"], "betas": chs["betas"],
        "gammas": chs["gammas"], "lk_alphas": chs["lk_alphas"],
        "pis": proof.pis.astype(np.uint64),
    }
