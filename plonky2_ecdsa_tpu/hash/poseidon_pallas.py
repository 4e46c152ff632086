"""Pallas/Mosaic TPU kernel for the Poseidon2 permutation.

Why a kernel: the jnp formulation of one permutation traces ~3k XLA ops, and a
full prove inlines the permutation at ~100 call sites (Merkle levels x trees +
FRI layers + transcript), which blew XLA compile time up to tens of minutes.
As a `pallas_call` each site is ONE custom-call op; Mosaic compiles the round
loop once per block shape in seconds.  It is also faster at runtime: the whole
30-round permutation runs out of VMEM with zero HBM round-trips between
rounds, where XLA would materialize inter-round state between fusions.

Kernel design notes (Mosaic-dictated):
  * The WIDTH=12 state lives as 12 separate [S, 128] row vectors carried as a
    pytree through the round loops — the linear layers then need NO rolls,
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


def _sbox_rows(rows):
    """x^7 per row; rows = list of (lo, hi).

    Lazily canonicalized (gl.square_nc/mul_nc): interiors stay u64-pair
    representatives mod p; the linear layer that consumes each S-box output
    re-canonicalizes in its recombination step, so round outputs (and the
    kernel's results) are bit-identical to the canonical reference path."""
    from ..fields import goldilocks as gl

    out = []
    for lo, hi in rows:
        x2 = gl.square_nc(lo, hi)
        x4 = gl.square_nc(*x2)
        x3 = gl.mul_nc(*x2, lo, hi)
        out.append(gl.mul_nc(*x4, *x3))
    return out


def _permute_rows(rc_lo_ref, rc_hi_ref, rows):
    """Shared 30-round Poseidon2 permutation body over a list of 12 (lo, hi)
    row arrays (used by the bulk permutation kernel and the grind kernel).

    Linear layers are the lazy 22-bit-part-plane formulations shared with
    hash/poseidon.py (_ext_layer_rows_u32 / _int_layer_rows_u32): the
    external M4-block schedule and the internal sum+diag layer both
    accumulate in plain u32 lanes with one modular recombination per row."""
    import jax

    from ..fields import goldilocks as gl
    from . import poseidon as ps

    def add_rc(rows, r):
        return [gl.add(lo, hi, rc_lo_ref[r, i], rc_hi_ref[r, i])
                for i, (lo, hi) in enumerate(rows)]

    def full_round(r, rows):
        rows = add_rc(rows, r)
        rows = _sbox_rows(rows)
        return ps._ext_layer_rows_u32(rows)

    def partial_round(r, rows):
        s0 = gl.add(rows[0][0], rows[0][1], rc_lo_ref[r, 0], rc_hi_ref[r, 0])
        rows = _sbox_rows([s0]) + rows[1:]
        return ps._int_layer_rows_u32(rows)

    rows = ps._ext_layer_rows_u32(rows)  # Poseidon2 initial external layer
    rows = jax.lax.fori_loop(0, ps.HALF_FULL_ROUNDS, full_round, rows)
    rows = jax.lax.fori_loop(ps.HALF_FULL_ROUNDS,
                             ps.HALF_FULL_ROUNDS + ps.PARTIAL_ROUNDS,
                             partial_round, rows)
    rows = jax.lax.fori_loop(ps.HALF_FULL_ROUNDS + ps.PARTIAL_ROUNDS,
                             ps.TOTAL_ROUNDS, full_round, rows)
    return rows


def _kernel(rc_lo_ref, rc_hi_ref, lo_ref, hi_ref, out_lo_ref, out_hi_ref):
    from . import poseidon as ps

    rows = [(lo_ref[i], hi_ref[i]) for i in range(ps.WIDTH)]
    rows = _permute_rows(rc_lo_ref, rc_hi_ref, rows)
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


# ---------------------------------------------------------------------------
# FRI proof-of-work grind kernel
#
# One grid program per proof lane; each program scans its lane's candidate
# space in 8x128 VMEM blocks, running the full permutation per block and
# stopping at the first block with a hit — total work per lane is its actual
# geometric search cost (~2^pow_bits candidates) with ZERO inter-op
# dispatch overhead.  The XLA while_loop formulation burned ~4x the optimum
# (every sweep ground ALL lanes at fixed width; compaction fixed the waste
# but its per-iteration argsort/scatter small-ops dominated on TPU).
# First-hit-in-candidate-order semantics match the numpy sweep exactly.
# ---------------------------------------------------------------------------

GRIND_BLOCK = 8 * 128  # candidates per in-kernel iteration


def _grind_kernel(rc_lo_ref, rc_hi_ref, st_lo_ref, st_hi_ref, shift_ref,
                  out_ref):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    from . import poseidon as ps

    W = ps.WIDTH
    b = pl.program_id(0)
    shape = (8, 128)
    idx = (jax.lax.broadcasted_iota(jnp.uint32, shape, 0) * np.uint32(128)
           + jax.lax.broadcasted_iota(jnp.uint32, shape, 1))
    shift = shift_ref[0]
    max_blocks = shift_ref[1]  # derived from max_chunks << chunk_log2 (host)

    def body(carry):
        base, w, found = carry
        cand = base * np.uint32(GRIND_BLOCK) + idx
        rows = [(cand, jnp.zeros(shape, jnp.uint32))]
        for i in range(1, W):
            rows.append((jnp.full(shape, st_lo_ref[b, i], jnp.uint32),
                         jnp.full(shape, st_hi_ref[b, i], jnp.uint32)))
        rows = _permute_rows(rc_lo_ref, rc_hi_ref, rows)
        ok = (rows[7][1] >> shift) == 0
        # Mosaic has no unsigned reductions: min over int32 with an in-range
        # sentinel (candidates stay < 2^28 < 2^31, so the cast is exact)
        sent = jnp.int32(0x7FFFFFFF)
        first = jnp.min(jnp.where(ok, cand.astype(jnp.int32), sent))
        hit = first != sent
        w = jnp.where(jnp.logical_and(hit, jnp.logical_not(found)),
                      first.astype(jnp.uint32), w)
        return base + 1, w, jnp.logical_or(found, hit)

    def cond(carry):
        base, _w, found = carry
        return jnp.logical_and(jnp.logical_not(found), base < max_blocks)

    _base, w, found = jax.lax.while_loop(
        cond, body, (jnp.uint32(0), jnp.uint32(0), jnp.bool_(False)))
    # exhaustion is reported, not silent (ADVICE r4): found=0 lanes carry
    # w=0, and the host wrapper poisons them to an impossible sentinel
    out_ref[b, 0] = w
    out_ref[b, 1] = found.astype(jnp.uint32)


@functools.lru_cache(maxsize=None)
def _build_grind_call(B: int, interpret: bool):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from . import poseidon as ps

    # SMEM operands must be whole-array blocks (Mosaic rejects sub-(8,128)
    # block shapes); the kernel indexes its lane row via pl.program_id.
    rc_spec = pl.BlockSpec((ps.TOTAL_ROUNDS, ps.WIDTH),
                           lambda b: (0, 0), memory_space=pltpu.SMEM)
    st_spec = pl.BlockSpec((B, ps.WIDTH), lambda b: (0, 0),
                           memory_space=pltpu.SMEM)
    sh_spec = pl.BlockSpec((2,), lambda b: (0,), memory_space=pltpu.SMEM)
    out_spec = pl.BlockSpec((B, 2), lambda b: (0, 0),
                            memory_space=pltpu.SMEM)
    return pl.pallas_call(
        _grind_kernel,
        grid=(B,),
        out_shape=jax.ShapeDtypeStruct((B, 2), jnp.uint32),
        in_specs=[rc_spec, rc_spec, st_spec, st_spec, sh_spec],
        out_specs=out_spec,
        interpret=interpret,
    )


def grind_pallas(state_lo, state_hi, pow_bits: int,
                 max_candidates: int = 1 << 27, interpret: bool = False):
    """state: (lo, hi) u32 [12, B] duplex states.  Returns (w, found), both
    [B]: per lane, the FIRST candidate c (ascending from 0) such that
    overwriting state[0] with c and permuting yields hi-word(out[7]) >>
    (32-pow_bits) == 0 — bit-identical to Challenger.grind's numpy sweep.
    found is False where the lane exhausted `max_candidates` (astronomically
    unlikely; the caller must not use w in that case — ADVICE r4).
    max_candidates must stay < 2^31 (int32-min reduction in the kernel)."""
    import jax.numpy as jnp

    from . import poseidon as ps

    assert 0 < max_candidates < (1 << 31)
    B = state_lo.shape[1]
    rc_lo = jnp.asarray(ps._RC_LO)
    rc_hi = jnp.asarray(ps._RC_HI)
    max_blocks = -(-max_candidates // GRIND_BLOCK)
    scal = jnp.asarray([32 - pow_bits, max_blocks], jnp.uint32)
    out = _build_grind_call(B, interpret)(
        rc_lo, rc_hi, state_lo.T, state_hi.T, scal)
    return out[:, 0], out[:, 1].astype(bool)


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
