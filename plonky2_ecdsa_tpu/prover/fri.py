"""FRI low-degree commitment: commit-phase folding + query phase, batched.

plonky2 FRI equivalent (SURVEY.md §2.9 proving pipeline: "FRI folding + query
openings").  Arity-2 folds; each committed layer's Merkle leaf holds the
(F(x), F(-x)) extension pair so one query opens both fold inputs.  All arrays
carry a leading batch axis; query indices are per-batch-element.  Backend
generic (numpy / jax.numpy).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import lru_cache

import numpy as np

from ..fields import goldilocks as gl
from ..hash import merkle
from . import ntt

P = gl.P


def plan(N: int, cfg):
    """(num_layers, final_size, nfinal) for the fold schedule."""
    final_size = min(N, 1 << (cfg.fri.final_poly_max_degree_bits + cfg.fri.rate_bits))
    num_layers = max(0, (N // final_size).bit_length() - 1)
    return num_layers, final_size, final_size >> cfg.fri.rate_bits


def _ext_stack4(e, half, xp):
    """ext pair [B, size] -> leaf data [B, half, 4]: (c0[j], c1[j], c0[j+h], c1[j+h])."""
    (l0, h0), (l1, h1) = e
    lo = xp.stack([l0[..., :half], l1[..., :half], l0[..., half:], l1[..., half:]], -1)
    hi = xp.stack([h0[..., :half], h1[..., :half], h0[..., half:], h1[..., half:]], -1)
    return lo, hi


@lru_cache(maxsize=None)
def _domain_tables(N, num_layers):
    """Per-layer (shift, generator, inv(2x_j) table) and the final shift."""
    tables = []
    shift = ntt.COSET_SHIFT
    size = N
    for _ in range(num_layers):
        half = size // 2
        g = pow(gl.POWER_OF_TWO_GENERATOR, (1 << 32) // size, P)
        inv2x = np.zeros(half, dtype=np.uint64)
        acc = pow(2 * shift % P, -1, P)
        ginv = pow(g, -1, P)
        for j in range(half):
            inv2x[j] = acc
            acc = acc * ginv % P
        tables.append((shift, g, inv2x))
        shift = shift * shift % P
        size = half
    return tables, shift


def host_tables(N: int, cfg) -> dict:
    """Host pytree of the FRI fold/final-poly tables for ntt._DEVICE_TABLES
    (see ntt.host_tables; avoids giant HLO literals under jit)."""
    num_layers, final_size, _nf = plan(N, cfg)
    tables, final_shift = _domain_tables(N, num_layers)
    from ..fields import goldilocks as _gl

    out = {}
    size = N
    for _shift, _g, inv2x in tables:
        half = size // 2
        out[f"fri_i2x:{half}"] = _gl.from_u64(inv2x)
        size = half
    shift_inv = pow(final_shift, -1, P)
    sp = np.zeros(size, dtype=np.uint64)
    acc = 1
    for i in range(size):
        sp[i] = acc
        acc = acc * shift_inv % P
    out[f"fri_spow:{size}"] = _gl.from_u64(sp)
    return out


@dataclass
class FriProof:
    caps: list          # per layer: (lo, hi) [B, C, 4]
    final_coeffs: tuple  # ext pair [B, nfinal]
    indices: object      # [B, Q] integer array
    layer_leaves: list  # per layer: (lo, hi) [B, Q, 4]
    layer_paths: list   # per layer: (lo, hi) [B, Q, depth, 4]
    pow_witness: object = None  # (lo, hi) [B] grinding witness, None if pow_bits=0


def fri_prove(challenger, F, N: int, cfg, xp=np) -> FriProof:
    """F: ext pair arrays [B, N] (the reduced batch polynomial's LDE evals)."""
    num_layers, final_size, nfinal = plan(N, cfg)
    tables, final_shift = _domain_tables(N, num_layers)

    trees = []
    leaves_store = []
    caps = []
    cur = F
    size = N
    inv2 = gl.from_int(pow(2, -1, P), (), xp)
    for shift, g, inv2x in tables:
        half = size // 2
        lo, hi = _ext_stack4(cur, half, xp)
        tree = merkle.build_merkle_tree(lo, hi, cfg.fri.cap_height)
        trees.append(tree)
        leaves_store.append((lo, hi))
        caps.append(tree.cap)
        challenger.observe_cap(tree.cap)
        beta = challenger.get_ext()
        a = ((cur[0][0][..., :half], cur[0][1][..., :half]),
             (cur[1][0][..., :half], cur[1][1][..., :half]))
        b = ((cur[0][0][..., half:], cur[0][1][..., half:]),
             (cur[1][0][..., half:], cur[1][1][..., half:]))
        s = gl.ext_add(a, b)
        d = gl.ext_sub(a, b)
        if xp is np:
            i2x = gl.from_u64(inv2x)
        else:
            i2x = ntt._tab(f"fri_i2x:{half}", lambda: tuple(
                xp.asarray(a_) for a_ in gl.from_u64(inv2x)))
        even = (gl.mul(*s[0], *inv2), gl.mul(*s[1], *inv2))
        odd = (gl.mul(*d[0], *i2x), gl.mul(*d[1], *i2x))
        bexp = ((beta[0][0][..., None], beta[0][1][..., None]),
                (beta[1][0][..., None], beta[1][1][..., None]))
        cur = gl.ext_add(even, gl.ext_mul(bexp, odd))
        size = half

    # final polynomial: coset INTT with the accumulated shift
    def _spow_host():
        shift_inv = pow(final_shift, -1, P)
        sp = np.zeros(size, dtype=np.uint64)
        acc = 1
        for i in range(size):
            sp[i] = acc
            acc = acc * shift_inv % P
        return gl.from_u64(sp)

    if xp is np:
        spl = _spow_host()
    else:
        spl = ntt._tab(f"fri_spow:{size}", lambda: tuple(
            xp.asarray(a_) for a_ in _spow_host()))
    comp = []
    for c in range(2):
        clo, chi = ntt.intt(*cur[c])
        clo, chi = gl.mul(clo, chi, *spl)
        comp.append((clo[..., :nfinal], chi[..., :nfinal]))
    final_coeffs = (comp[0], comp[1])
    challenger.observe_ext_array(final_coeffs)

    # proof-of-work grinding before query sampling (plonky2 fri/prover.rs
    # grind step; raises the cost of transcript re-rolls by 2^pow_bits)
    pow_witness = None
    if cfg.fri.proof_of_work_bits:
        pow_witness = challenger.grind(cfg.fri.proof_of_work_bits)

    idx_list = challenger.get_indices(N, cfg.fri.num_query_rounds)
    indices = xp.stack([ix.astype(xp.int32) for ix in idx_list], axis=-1)  # [B, Q]

    take = np.take_along_axis if xp is np else _jnp_take_along
    layer_leaves = []
    layer_paths = []
    idx = indices
    size = N
    for tree, (llo, lhi) in zip(trees, leaves_store):
        half = size // 2
        li = idx % half
        layer_leaves.append((take(llo, li[..., None], -2),
                             take(lhi, li[..., None], -2)))
        layer_paths.append(tree.open(li))
        idx = li
        size = half

    return FriProof(caps=caps, final_coeffs=final_coeffs, indices=indices,
                    layer_leaves=layer_leaves, layer_paths=layer_paths,
                    pow_witness=pow_witness)


def _jnp_take_along(arr, idx, axis):
    import jax.numpy as jnp

    return jnp.take_along_axis(arr, idx, axis=axis)
