"""Exact one-hot-matmul gathers for the FRI query phase.

XLA:TPU lowers small irregular gathers (42 query indices out of a 2^15-point
LDE domain, per batch lane) to slow scalar/dynamic-slice code — the r3
profile put the query phase at ~14% of device compute.  On TPU the fast
formulation is a matmul: build a {0,1} one-hot matrix over the gathered axis
and contract it on the MXU (VERDICT r3 next #1 "one packed gather").

Exactness: u32 values are split into 16-bit halves, each exactly
representable in f32; the one-hot contraction sums exactly one nonzero term
per output element, so no rounding can occur at any accumulation order.
The result converts back bit-exactly.  Parity vs numpy take_along_axis is
tested in tests/test_prover.py (CPU jnp) and preflighted on-chip by
scripts/tpu_checks.py.
"""

from __future__ import annotations

import numpy as np


def _onehot_f32(idx, size):
    """idx [B, Q] int -> one-hot [B, Q, size] f32."""
    import jax
    import jax.numpy as jnp

    io = jax.lax.broadcasted_iota(jnp.int32, (1, 1, size), 2)
    return (idx[:, :, None].astype(jnp.int32) == io).astype(jnp.float32)


def _contract(oh, plane, pattern):
    """Exact u32 gather of one plane via two u16-half f32 matmuls.

    precision=HIGHEST is REQUIRED: the TPU MXU's default matmul precision
    truncates f32 operands to bf16 (8-bit mantissa), which corrupts u16
    payloads — caught by the on-chip preflight (scripts/tpu_checks.py) the
    first time this ran on real hardware.  At HIGHEST the f32 operands are
    carried exactly (multi-pass bf16 decomposition) and the one-nonzero-
    per-row contraction cannot round."""
    import jax
    import jax.numpy as jnp

    lo16 = (plane & np.uint32(0xFFFF)).astype(jnp.float32)
    hi16 = (plane >> np.uint32(16)).astype(jnp.float32)
    g_lo = jnp.einsum(pattern, oh, lo16,
                      precision=jax.lax.Precision.HIGHEST,
                      preferred_element_type=jnp.float32).astype(jnp.uint32)
    g_hi = jnp.einsum(pattern, oh, hi16,
                      precision=jax.lax.Precision.HIGHEST,
                      preferred_element_type=jnp.float32).astype(jnp.uint32)
    return g_lo | (g_hi << np.uint32(16))


def gather_cols(pair, idx):
    """pair: (lo, hi) [B, k, N]; idx [B, Q] -> (lo, hi) [B, Q, k]
    (equivalent to take_along_axis on the last axis + moveaxis)."""
    N = pair[0].shape[-1]
    oh = _onehot_f32(idx, N)
    return (_contract(oh, pair[0], "bqn,bkn->bqk"),
            _contract(oh, pair[1], "bqn,bkn->bqk"))


def gather_cols_unbatched(pair, idx):
    """pair: (lo, hi) [k, N] shared across the batch; idx [B, Q] ->
    (lo, hi) [B, Q, k]."""
    N = pair[0].shape[-1]
    oh = _onehot_f32(idx, N)
    return (_contract(oh, pair[0], "bqn,kn->bqk"),
            _contract(oh, pair[1], "bqn,kn->bqk"))


def gather_rows(arr, idx):
    """arr [B, size, W] u32; idx [B, Q] -> [B, Q, W] (take_along_axis on the
    middle axis; the Merkle-level / FRI-leaf digest shape)."""
    size = arr.shape[-2]
    oh = _onehot_f32(idx, size)
    return _contract(oh, arr, "bqn,bnw->bqw")


def use_onehot(xp) -> bool:
    import os

    if xp is np or os.environ.get("PLONKY2_TPU_NO_ONEHOT_GATHER") == "1":
        return False
    return True
