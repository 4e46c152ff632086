"""Pallas/Mosaic TPU kernel for the Poseidon permutation.

Why a kernel: the jnp formulation of one permutation traces ~3k XLA ops, and a
full prove inlines the permutation at ~100 call sites (Merkle levels x trees +
FRI layers + transcript), which blew XLA compile time up to tens of minutes.
As a `pallas_call` each site is ONE custom-call op; Mosaic compiles the round
loop once per block shape in seconds.  It is also faster at runtime: the whole
30-round permutation runs out of VMEM with zero HBM round-trips between
rounds, where XLA would materialize inter-round state between fusions.

Kernel design notes (Mosaic-dictated):
  * The WIDTH=12 state lives as 12 separate [S, 128] row vectors carried as a
    pytree through the round loops — the MDS circulant then needs NO rolls,
    reshapes, or gathers (all unsupported/slow on the (sublane, lane) tile),
    just static Python indexing of rows.
  * Round constants sit in SMEM as a [30, 12] scalar table; each round reads
    12 scalars with a dynamic row index (scalar SMEM reads are free).
  * Rounds run as 3 `fori_loop`s (full/partial/full) so Mosaic compiles one
    round body per loop, not 30 copies.

The wrapper pads the flattened lane axis up to a block multiple and grids over
lane blocks.  The round function math is shared with hash/poseidon.py via the
module-level MDS/S-box helpers, so there is a single source of truth.

Correctness: tests/test_prover.py::test_poseidon_pallas_interpret (CPU
interpret mode) plus on-device parity checks in scripts/tpu_checks.py.
"""

from __future__ import annotations

import functools

import numpy as np

BLOCK_SUBLANES = 64  # per-block lane count = 64 * 128 = 8192 hash lanes


def _sbox_rows(rows, mul):
    """x^7 per row; rows = list of (lo, hi)."""
    out = []
    for lo, hi in rows:
        x2 = mul(lo, hi, lo, hi)
        x4 = mul(*x2, *x2)
        x3 = mul(*x2, lo, hi)
        out.append(mul(*x4, *x3))
    return out


def _kernel(rc_lo_ref, rc_hi_ref, lo_ref, hi_ref, out_lo_ref, out_hi_ref):
    import jax

    from ..fields import goldilocks as gl
    from . import poseidon as ps

    W = ps.WIDTH
    rows = [(lo_ref[i], hi_ref[i]) for i in range(W)]

    def add_rc(rows, r):
        return [gl.add(lo, hi, rc_lo_ref[r, i], rc_hi_ref[r, i])
                for i, (lo, hi) in enumerate(rows)]

    def mds(rows):
        # lazy 22-bit-part accumulation (see poseidon._mds_stacked_u32 /
        # _mds_split3): split each row once, accumulate the <=41-weight
        # circulant in plain u32 lanes, one modular recombination per row
        parts = [ps._mds_split3(lo, hi) for lo, hi in rows]
        out = []
        for i in range(W):
            q = [None] * 3
            for d, c in enumerate(ps.MDS_CIRC):
                c = np.uint32(c)
                src = parts[(i + d) % W]
                for k in range(3):
                    t = src[k] * c
                    q[k] = t if q[k] is None else q[k] + t
            if i == 0:
                d0c = np.uint32(ps.MDS_DIAG0)
                q = [qk + parts[0][k] * d0c for k, qk in enumerate(q)]
            out.append(ps._mds_recombine3(q))
        return out

    def full_round(r, rows):
        rows = add_rc(rows, r)
        rows = _sbox_rows(rows, gl.mul)
        return mds(rows)

    def partial_round(r, rows):
        rows = add_rc(rows, r)
        rows = _sbox_rows(rows[:1], gl.mul) + rows[1:]
        return mds(rows)

    rows = jax.lax.fori_loop(0, ps.HALF_FULL_ROUNDS, full_round, rows)
    rows = jax.lax.fori_loop(ps.HALF_FULL_ROUNDS,
                             ps.HALF_FULL_ROUNDS + ps.PARTIAL_ROUNDS,
                             partial_round, rows)
    rows = jax.lax.fori_loop(ps.HALF_FULL_ROUNDS + ps.PARTIAL_ROUNDS,
                             ps.TOTAL_ROUNDS, full_round, rows)
    for i, (lo, hi) in enumerate(rows):
        out_lo_ref[i] = lo
        out_hi_ref[i] = hi


@functools.lru_cache(maxsize=None)
def _build_call(num_blocks: int, interpret: bool):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from . import poseidon as ps

    S = BLOCK_SUBLANES
    rc_spec = pl.BlockSpec((ps.TOTAL_ROUNDS, ps.WIDTH),
                           lambda i: (0, 0), memory_space=pltpu.SMEM)
    blk_spec = pl.BlockSpec((ps.WIDTH, S, 128), lambda i: (0, i, 0),
                            memory_space=pltpu.VMEM)
    shape = jax.ShapeDtypeStruct((ps.WIDTH, num_blocks * S, 128), jnp.uint32)
    return pl.pallas_call(
        _kernel,
        grid=(num_blocks,),
        out_shape=(shape, shape),
        in_specs=[rc_spec, rc_spec, blk_spec, blk_spec],
        out_specs=(blk_spec, blk_spec),
        interpret=interpret,
    )


def permute_stacked_pallas(lo, hi, interpret: bool = False):
    """[12, ...] u32 pairs -> permuted pair, via the Mosaic kernel."""
    import jax.numpy as jnp

    from . import poseidon as ps

    assert lo.shape[0] == ps.WIDTH
    tail = lo.shape[1:]
    m = int(np.prod(tail)) if tail else 1
    blk = BLOCK_SUBLANES * 128
    num_blocks = max(1, -(-m // blk))
    mp = num_blocks * blk
    flo = lo.reshape(ps.WIDTH, m)
    fhi = hi.reshape(ps.WIDTH, m)
    if mp != m:
        pad = jnp.zeros((ps.WIDTH, mp - m), jnp.uint32)
        flo = jnp.concatenate([flo, pad], axis=1)
        fhi = jnp.concatenate([fhi, pad], axis=1)
    flo = flo.reshape(ps.WIDTH, mp // 128, 128)
    fhi = fhi.reshape(ps.WIDTH, mp // 128, 128)
    rc_lo = jnp.asarray(ps._RC_LO)
    rc_hi = jnp.asarray(ps._RC_HI)
    olo, ohi = _build_call(num_blocks, interpret)(rc_lo, rc_hi, flo, fhi)
    olo = olo.reshape(ps.WIDTH, mp)[:, :m].reshape((ps.WIDTH,) + tail)
    ohi = ohi.reshape(ps.WIDTH, mp)[:, :m].reshape((ps.WIDTH,) + tail)
    return olo, ohi
