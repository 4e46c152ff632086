"""The batched PLONK+FRI prover.

plonky2 `prove()` equivalent (SURVEY.md §2.9 proving pipeline): wire
commitment -> permutation grand products (+ partial products, chunk size 8)
-> alpha-combined quotient -> FRI batch opening at zeta / g*zeta.

TPU-first structure: every step is a tensor program with a leading batch axis
(one lane per signature/proof) — the axis that replaces the reference's rayon
parallelism (SURVEY.md §2 parallelism inventory).  The same code path runs
under numpy (host/CI) and, with arrays swapped to jax.numpy, under jit for the
device path (see parallel/).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..circuit.gates import PublicInputGate
from ..circuit.algebra import BaseAlgebra
from ..fields import goldilocks as gl
from ..hash import merkle
from . import fri, ntt
from .challenger import Challenger
from .data import CircuitData

P = gl.P


# ---------------------------------------------------------------------------
# small pair/ext helpers
# ---------------------------------------------------------------------------

def _ones_like(lo):
    return np.ones_like(lo), np.zeros_like(lo)


def _bcast_pair(pair, shape):
    return (np.broadcast_to(pair[0], shape), np.broadcast_to(pair[1], shape))


def _prefix_prod_exclusive(lo, hi):
    """Exclusive modular prefix product over the last axis (log-depth scan)."""
    n = lo.shape[-1]
    shift = 1
    while shift < n:
        olo = np.ones(lo.shape[:-1] + (shift,), np.uint32)
        ohi = np.zeros_like(olo)
        slo = np.concatenate([olo, lo[..., :-shift]], -1)
        shi = np.concatenate([ohi, hi[..., :-shift]], -1)
        lo, hi = gl.mul(lo, hi, slo, shi)
        shift *= 2
    olo = np.ones(lo.shape[:-1] + (1,), np.uint32)
    ohi = np.zeros_like(olo)
    return (np.concatenate([olo, lo[..., :-1]], -1),
            np.concatenate([ohi, hi[..., :-1]], -1))


def _ext_from_base(pair):
    z = (np.zeros_like(pair[0]), np.zeros_like(pair[1]))
    return (pair, z)


def _ext_bcast(e, shape):
    return (_bcast_pair(e[0], shape), _bcast_pair(e[1], shape))


def _ext_index(e, sl):
    return ((e[0][0][sl], e[0][1][sl]), (e[1][0][sl], e[1][1][sl]))


def _ext_expand(e):
    """Add a trailing axis to an ext pair."""
    return ((e[0][0][..., None], e[0][1][..., None]),
            (e[1][0][..., None], e[1][1][..., None]))


@dataclass
class OpeningLayout:
    """Canonical poly order shared by openings + FRI reduction."""
    num_fixed: int
    num_wires: int
    num_zs_partials: int
    num_quotient: int

    @property
    def total(self):
        return self.num_fixed + self.num_wires + self.num_zs_partials + self.num_quotient

    def slices(self):
        o = 0
        out = {}
        for name, k in [("fixed", self.num_fixed), ("wires", self.num_wires),
                        ("zs_partials", self.num_zs_partials), ("quotient", self.num_quotient)]:
            out[name] = slice(o, o + k)
            o += k
        return out


@dataclass
class Proof:
    pis: np.ndarray          # [B, npis] u64
    wires_cap: tuple
    zs_cap: tuple
    quotient_cap: tuple
    openings0: tuple         # ext pair [B, layout.total] (everything at zeta)
    openings1: tuple         # ext pair [B, C] (Z polys at g*zeta)
    fri_proof: fri.FriProof
    initial_leaves: dict     # tree name -> (lo, hi) [B, Q, npolys]
    initial_paths: dict      # tree name -> (lo, hi) [B, Q, depth, 4]
    layout: OpeningLayout


def _lde_commit(vals_pair, n, N, cap_height):
    """values on H [B, k, n] -> (coeffs, lde, tree)."""
    clo, chi = ntt.intt(*vals_pair)
    pad = np.zeros(clo.shape[:-1] + (N - n,), np.uint32)
    clo_p = np.concatenate([clo, pad], -1)
    chi_p = np.concatenate([chi, pad], -1)
    lde = ntt.coset_ntt_from_coeffs(clo_p, chi_p)
    leaves_lo = np.ascontiguousarray(np.moveaxis(lde[0], -2, -1))  # [B, N, k]
    leaves_hi = np.ascontiguousarray(np.moveaxis(lde[1], -2, -1))
    tree = merkle.build_merkle_tree(leaves_lo, leaves_hi, cap_height)
    return (clo, chi), lde, tree


def prove(data: CircuitData, W: np.ndarray, pis: np.ndarray) -> Proof:
    circuit = data.circuit
    cfg = circuit.config
    n, N = data.n, data.N
    C = cfg.num_challenges
    nr = cfg.num_routed_wires
    chunk = cfg.permutation_chunk_size
    nchunks = nr // chunk
    B = W.shape[-1]

    # ---- wires ------------------------------------------------------------
    wires_u64 = np.ascontiguousarray(np.moveaxis(W, -1, 0))  # [B, wires, n]
    wires_vals = gl.from_u64(wires_u64)
    wires_coeffs, wires_lde, wires_tree = _lde_commit(wires_vals, n, N, cfg.fri.cap_height)

    # ---- public-input polynomials (no commitment needed) ------------------
    K = circuit.pi.num_cols
    pi_vals = np.zeros((B, K, n), np.uint64)
    for blk, row in enumerate(circuit.pi.rows):
        for j in range(K):
            idx = blk * K + j
            if idx < circuit.pi.count:
                pi_vals[:, j, row] = pis[:, idx]
    pi_clo, pi_chi = ntt.intt(*gl.from_u64(pi_vals))
    pad = np.zeros((B, K, N - n), np.uint32)
    pi_lde = ntt.coset_ntt_from_coeffs(
        np.concatenate([pi_clo, pad], -1), np.concatenate([pi_chi, pad], -1))

    # ---- transcript start --------------------------------------------------
    ch = Challenger(np, (B,))
    ch.observe_cap(_bcast_pair_cap(data.fixed_tree.cap, B))
    for i in range(pis.shape[1]):
        ch.observe_u64(pis[:, i])
    ch.observe_cap(wires_tree.cap)
    betas, gammas = [], []
    for _ in range(C):
        betas.append(ch.get_challenge())
        gammas.append(ch.get_challenge())

    # ---- permutation grand products ---------------------------------------
    routed = (wires_vals[0][:, :nr], wires_vals[1][:, :nr])  # [B, nr, n]
    ids = gl.from_u64(data.id_encodings)            # [nr, n]
    sig = gl.from_u64(
        data.fixed_values[cfg.num_constant_cols + len(circuit.gates):])  # sigmas [nr, n]
    zs_list_lo, zs_list_hi = [], []
    r9_per_c = []
    for c in range(C):
        beta = (betas[c][0][:, None, None], betas[c][1][:, None, None])
        gamma = (gammas[c][0][:, None, None], gammas[c][1][:, None, None])
        bid = gl.mul(*_bcast_pair(ids, routed[0].shape), *_bcast_pair(beta, routed[0].shape))
        bsg = gl.mul(*_bcast_pair(sig, routed[0].shape), *_bcast_pair(beta, routed[0].shape))
        f = gl.add(*gl.add(*routed, *bid), *_bcast_pair(gamma, routed[0].shape))
        g_ = gl.add(*gl.add(*routed, *bsg), *_bcast_pair(gamma, routed[0].shape))
        # chunk products [B, nchunks, n]
        fP = _chunk_prod(f, chunk)
        gP = _chunk_prod(g_, chunk)
        gInv = gl.inverse(*gP)
        quot = gl.mul(*fP, *gInv)
        # running products across chunks R_t
        Rlo = [quot[0][:, 0]]
        Rhi = [quot[1][:, 0]]
        for t in range(1, nchunks):
            nl, nh = gl.mul(Rlo[-1], Rhi[-1], quot[0][:, t], quot[1][:, t])
            Rlo.append(nl)
            Rhi.append(nh)
        zlo, zhi = _prefix_prod_exclusive(Rlo[-1], Rhi[-1])  # Z over rows [B, n]
        r9_per_c.append((Rlo[-1], Rhi[-1]))
        zs_list_lo.append(zlo)
        zs_list_hi.append(zhi)
        for t in range(nchunks - 1):  # partials P_0..P_8
            plo, phi = gl.mul(zlo, zhi, Rlo[t], Rhi[t])
            zs_list_lo.append(plo)
            zs_list_hi.append(phi)
    zs_vals = (np.stack(zs_list_lo, 1), np.stack(zs_list_hi, 1))  # [B, C*nchunks, n]
    zs_coeffs, zs_lde, zs_tree = _lde_commit(zs_vals, n, N, cfg.fri.cap_height)
    ch.observe_cap(zs_tree.cap)
    alphas = [ch.get_challenge() for _ in range(C)]

    # ---- quotient ----------------------------------------------------------
    quot_vals = _compute_quotient(data, wires_lde, zs_lde, pi_lde, betas, gammas,
                                  alphas, B)
    # INTT -> coeffs [B, C, N] -> chunks [B, C*rate, n]
    qc = ntt.coset_intt(*quot_vals)  # [B, C, N]
    rate = N // n
    chunks_lo = qc[0].reshape(B, C, rate, n).reshape(B, C * rate, n)
    chunks_hi = qc[1].reshape(B, C, rate, n).reshape(B, C * rate, n)
    # chunks are already coefficient polys of degree < n; commit via coset NTT
    quot_lde = ntt.coset_ntt_from_coeffs(
        np.concatenate([chunks_lo, np.zeros((B, C * rate, N - n), np.uint32)], -1),
        np.concatenate([chunks_hi, np.zeros((B, C * rate, N - n), np.uint32)], -1),
    )
    qleaves_lo = np.ascontiguousarray(np.moveaxis(quot_lde[0], -2, -1))
    qleaves_hi = np.ascontiguousarray(np.moveaxis(quot_lde[1], -2, -1))
    quot_tree = merkle.build_merkle_tree(qleaves_lo, qleaves_hi, cfg.fri.cap_height)
    ch.observe_cap(quot_tree.cap)
    zeta = ch.get_ext()

    # ---- openings ----------------------------------------------------------
    layout = OpeningLayout(
        num_fixed=data.fixed_values.shape[0],
        num_wires=cfg.num_wires,
        num_zs_partials=C * nchunks,
        num_quotient=C * rate,
    )
    zpows = ntt.ext_powers(zeta, n)  # [B, n] ext
    zp = (( zpows[0][0][:, None], zpows[0][1][:, None]),
          ( zpows[1][0][:, None], zpows[1][1][:, None]))
    fixed_c = data.fixed_coeffs  # [F0, n] no batch
    open_fixed = ntt.eval_poly_ext(fixed_c[0][None], fixed_c[1][None], zp)  # [B, F0]
    open_wires = ntt.eval_poly_ext(*wires_coeffs, zp)
    open_zs = ntt.eval_poly_ext(*zs_coeffs, zp)
    quot_coeffs = (chunks_lo, chunks_hi)
    open_quot = ntt.eval_poly_ext(*quot_coeffs, zp)
    gz = _ext_mul_base_const(zeta, data.g)
    gzpows = ntt.ext_powers(gz, n)
    gzp = (( gzpows[0][0][:, None], gzpows[0][1][:, None]),
           ( gzpows[1][0][:, None], gzpows[1][1][:, None]))
    z_idx = [c * nchunks for c in range(C)]
    zonly_coeffs = (zs_coeffs[0][:, z_idx], zs_coeffs[1][:, z_idx])
    open_zs_gzeta = ntt.eval_poly_ext(*zonly_coeffs, gzp)  # [B, C]

    openings0 = _ext_concat([open_fixed, open_wires, open_zs, open_quot])
    for i in range(layout.total):
        ch.observe_ext(_ext_index(openings0, (slice(None), i)))
    for i in range(C):
        ch.observe_ext(_ext_index(open_zs_gzeta, (slice(None), i)))

    # ---- FRI reduced polynomial -------------------------------------------
    fri_alpha = ch.get_ext()
    x_pair = gl.from_u64(data.x_lde)  # [N]
    F = _reduced_poly(data, layout, wires_lde, zs_lde, quot_lde, openings0,
                      open_zs_gzeta, zeta, gz, fri_alpha, z_idx, B)
    fri_proof = fri.fri_prove(ch, F, N, cfg)

    # ---- initial tree openings at query indices ---------------------------
    idx = fri_proof.indices  # [B, Q]
    initial_leaves = {}
    initial_paths = {}
    trees = {
        "fixed": (data.fixed_lde, data.fixed_tree, False),
        "wires": (wires_lde, wires_tree, True),
        "zs": (zs_lde, zs_tree, True),
        "quot": (quot_lde, quot_tree, True),
    }
    for name, (lde, tree, batched) in trees.items():
        lo, hi = lde
        if batched:
            leaf_lo = np.take_along_axis(lo, idx[:, None, :], -1)  # [B, k, Q]
            leaf_hi = np.take_along_axis(hi, idx[:, None, :], -1)
            initial_leaves[name] = (np.moveaxis(leaf_lo, 1, 2), np.moveaxis(leaf_hi, 1, 2))
            initial_paths[name] = tree.open(idx)
        else:
            leaf_lo = lo[:, idx]  # [k, B, Q]
            leaf_hi = hi[:, idx]
            initial_leaves[name] = (np.moveaxis(leaf_lo, 0, 2), np.moveaxis(leaf_hi, 0, 2))
            plo, phi = tree.open(idx)  # levels unbatched: idx [B, Q] broadcast
            initial_paths[name] = (plo, phi)

    return Proof(
        pis=pis,
        wires_cap=wires_tree.cap,
        zs_cap=zs_tree.cap,
        quotient_cap=quot_tree.cap,
        openings0=openings0,
        openings1=open_zs_gzeta,
        fri_proof=fri_proof,
        initial_leaves=initial_leaves,
        initial_paths=initial_paths,
        layout=layout,
    )


def _bcast_pair_cap(cap, B):
    lo, hi = cap
    return (np.broadcast_to(lo, (B,) + lo.shape), np.broadcast_to(hi, (B,) + hi.shape))


def _chunk_prod(pair, chunk):
    """[B, nr, n] -> [B, nr/chunk, n] products along the wire axis."""
    lo, hi = pair
    B, nr, n = lo.shape
    lo = lo.reshape(B, nr // chunk, chunk, n)
    hi = hi.reshape(B, nr // chunk, chunk, n)
    plo, phi = lo[:, :, 0], hi[:, :, 0]
    for j in range(1, chunk):
        plo, phi = gl.mul(plo, phi, lo[:, :, j], hi[:, :, j])
    return plo, phi


def _ext_concat(exts):
    l0 = np.concatenate([e[0][0] for e in exts], -1)
    h0 = np.concatenate([e[0][1] for e in exts], -1)
    l1 = np.concatenate([e[1][0] for e in exts], -1)
    h1 = np.concatenate([e[1][1] for e in exts], -1)
    return ((l0, h0), (l1, h1))


def _ext_mul_base_const(e, c: int):
    cp = gl.from_int(c, ())
    return (gl.mul(*e[0], *cp), gl.mul(*e[1], *cp))


def _alpha_pows(alpha, count):
    """Base-field challenge powers alpha^0..alpha^(count-1): [count] pairs [B]."""
    pows = [(_ones_like(alpha[0]))]
    for _ in range(count - 1):
        pows.append(gl.mul(*pows[-1], *alpha))
    return pows


def _compute_quotient(data, wires_lde, zs_lde, pi_lde, betas, gammas, alphas, B):
    """Combined constraint evals / Z_H over the LDE coset -> [B, C, N] pairs."""
    circuit = data.circuit
    cfg = circuit.config
    n, N = data.n, data.N
    C = cfg.num_challenges
    nr = cfg.num_routed_wires
    chunk = cfg.permutation_chunk_size
    nchunks = nr // chunk
    S = len(circuit.gates)
    shape = (B, N)

    apows = [_alpha_pows(alphas[c], data.num_constraint_slots) for c in range(C)]
    comb = [(np.zeros(shape, np.uint32), np.zeros(shape, np.uint32)) for _ in range(C)]

    def add_term(slot, term):
        for c in range(C):
            ap = _bcast_pair((apows[c][slot][0][:, None], apows[c][slot][1][:, None]), shape)
            t = gl.mul(*term, *ap)
            comb[c] = gl.add(*comb[c], *t)

    # ---- permutation constraints (slots 0..perm_slots-1, per challenge) ----
    x_pair = gl.from_u64(data.x_lde)  # [N]
    ids_lde = []
    for j, kj in enumerate(circuit.k_coeffs):
        ids_lde.append(gl.mul_small(*x_pair, np.uint32(kj)) if kj < (1 << 32)
                       else gl.mul(*x_pair, *gl.from_int(kj, (N,))))
    sel_off = cfg.num_constant_cols
    sig_rows = slice(sel_off + S, sel_off + S + nr)
    sig_lde = (data.fixed_lde[0][sig_rows], data.fixed_lde[1][sig_rows])
    roll = N // n
    for c in range(C):
        beta = (betas[c][0][:, None], betas[c][1][:, None])
        gamma = (gammas[c][0][:, None], gammas[c][1][:, None])
        z = (zs_lde[0][:, c * nchunks], zs_lde[1][:, c * nchunks])  # [B, N]
        z_shift = (np.roll(z[0], -roll, -1), np.roll(z[1], -roll, -1))
        partials = [(zs_lde[0][:, c * nchunks + 1 + t], zs_lde[1][:, c * nchunks + 1 + t])
                    for t in range(nchunks - 1)]
        # slot 0: L0 * (Z - 1)
        l0 = _bcast_pair(data.l0_lde, shape)
        zm1 = gl.sub(*z, *_bcast_pair(_ones_like(np.zeros(1, np.uint32)), shape))
        term = gl.mul(*l0, *zm1)
        ap = _bcast_pair((apows[c][0][0][:, None], apows[c][0][1][:, None]), shape)
        comb[c] = gl.add(*comb[c], *gl.mul(*term, *ap))
        # chunk products over LDE
        fs, gs = [], []
        for t in range(nchunks):
            fp, gp = None, None
            for j in range(t * chunk, (t + 1) * chunk):
                w = (wires_lde[0][:, j], wires_lde[1][:, j])
                bid = gl.mul(*_bcast_pair(ids_lde[j], shape), *_bcast_pair(beta, shape))
                bsg = gl.mul(*_bcast_pair((sig_lde[0][j], sig_lde[1][j]), shape),
                             *_bcast_pair(beta, shape))
                fj = gl.add(*gl.add(*w, *bid), *_bcast_pair(gamma, shape))
                gj = gl.add(*gl.add(*w, *bsg), *_bcast_pair(gamma, shape))
                fp = fj if fp is None else gl.mul(*fp, *fj)
                gp = gj if gp is None else gl.mul(*gp, *gj)
            fs.append(fp)
            gs.append(gp)
        # step constraints
        for t in range(nchunks):
            left = partials[t] if t < nchunks - 1 else z_shift
            prev = z if t == 0 else partials[t - 1]
            termt = gl.sub(*gl.mul(*left, *gs[t]), *gl.mul(*prev, *fs[t]))
            ap = _bcast_pair((apows[c][1 + t][0][:, None], apows[c][1 + t][1][:, None]), shape)
            comb[c] = gl.add(*comb[c], *gl.mul(*termt, *ap))

    # ---- gate constraints --------------------------------------------------
    alg = BaseAlgebra(np, shape)
    consts = [( _bcast_pair((data.fixed_lde[0][j], data.fixed_lde[1][j]), shape))
              for j in range(cfg.num_constant_cols)]
    for gi, gate in enumerate(circuit.gates):
        if gate.num_constraints == 0:
            continue
        sel = _bcast_pair((data.fixed_lde[0][sel_off + gi], data.fixed_lde[1][sel_off + gi]),
                          shape)
        wires = [(_bcast_pair((wires_lde[0][:, w], wires_lde[1][:, w]), shape))
                 for w in range(gate.num_wires)]
        ctx = {}
        if isinstance(gate, PublicInputGate):
            ctx["pi_vals"] = [(_bcast_pair((pi_lde[0][:, j], pi_lde[1][:, j]), shape))
                              for j in range(gate.num_cols)]
        cons = gate.eval(alg, wires, consts, ctx)
        for s, cval in enumerate(cons):
            term = gl.mul(*sel, *cval)
            add_term(data.perm_slots + s, term)

    # ---- divide by Z_H -----------------------------------------------------
    zh = _bcast_pair(data.zh_inv, shape)
    out_lo, out_hi = [], []
    for c in range(C):
        q = gl.mul(*comb[c], *zh)
        out_lo.append(q[0])
        out_hi.append(q[1])
    return (np.stack(out_lo, 1), np.stack(out_hi, 1))  # [B, C, N]


def _reduced_poly(data, layout, wires_lde, zs_lde, quot_lde, openings0,
                  open_zs_gzeta, zeta, gzeta, alpha, z_idx, B):
    """F(x) = sum_i a^i (p_i(x)-y_i)/(x-zeta) + a^n0 * sum_j a^j (z_j(x)-y'_j)/(x-g zeta)."""
    N = data.N
    shape = (B, N)
    x_pair = _bcast_pair(gl.from_u64(data.x_lde), shape)
    x_ext = _ext_from_base(x_pair)
    zeta_bb = (_bcast_pair(_ext_expand(zeta)[0], shape), _bcast_pair(_ext_expand(zeta)[1], shape))
    gz_bb = (_bcast_pair(_ext_expand(gzeta)[0], shape), _bcast_pair(_ext_expand(gzeta)[1], shape))
    inv0 = gl.ext_inverse(gl.ext_sub(x_ext, zeta_bb))
    inv1 = gl.ext_inverse(gl.ext_sub(x_ext, gz_bb))

    a_b = (_bcast_pair(_ext_expand(alpha)[0], shape), _bcast_pair(_ext_expand(alpha)[1], shape))
    zero = np.zeros(shape, np.uint32)
    acc = ((zero, zero), (zero.copy(), zero.copy()))
    apow = ((np.ones(shape, np.uint32), zero.copy()), (zero.copy(), zero.copy()))

    def poly_iter():
        F0 = layout.num_fixed
        for j in range(F0):
            yield _bcast_pair((data.fixed_lde[0][j], data.fixed_lde[1][j]), shape)
        for j in range(layout.num_wires):
            yield (wires_lde[0][:, j], wires_lde[1][:, j])
        for j in range(layout.num_zs_partials):
            yield (zs_lde[0][:, j], zs_lde[1][:, j])
        for j in range(layout.num_quotient):
            yield (quot_lde[0][:, j], quot_lde[1][:, j])

    for i, p in enumerate(poly_iter()):
        y = _ext_index(openings0, (slice(None), i))
        yb = (_bcast_pair(_ext_expand(y)[0], shape), _bcast_pair(_ext_expand(y)[1], shape))
        diff = gl.ext_sub(_ext_from_base(p), yb)
        acc = gl.ext_add(acc, gl.ext_mul(apow, diff))
        apow = gl.ext_mul(apow, a_b)
    F = gl.ext_mul(acc, inv0)

    acc1 = ((zero.copy(), zero.copy()), (zero.copy(), zero.copy()))
    apow1 = ((np.ones(shape, np.uint32), zero.copy()), (zero.copy(), zero.copy()))
    for k, j in enumerate(z_idx):
        pz = (zs_lde[0][:, j], zs_lde[1][:, j])
        y = _ext_index(open_zs_gzeta, (slice(None), k))
        yb = (_bcast_pair(_ext_expand(y)[0], shape), _bcast_pair(_ext_expand(y)[1], shape))
        diff = gl.ext_sub(_ext_from_base(pz), yb)
        acc1 = gl.ext_add(acc1, gl.ext_mul(apow1, diff))
        apow1 = gl.ext_mul(apow1, a_b)
    F = gl.ext_add(F, gl.ext_mul(apow, gl.ext_mul(acc1, inv1)))
    return F
