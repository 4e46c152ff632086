"""Pallas/Mosaic TPU kernels: fully-fused four-step Goldilocks NTT.

Why a kernel: under XLA every butterfly stage of a sub-NTT materializes the
whole tensor to HBM (the slice/concat chain defeats fusion) and the
bit-reversal permutations lower to gathers — a full 2^16 transform costs
~20 HBM passes.  Here the entire transform runs as TWO kernel launches plus
one XLA transpose (~6 passes), with all butterfly stages, both bit-reversal
permutations, the four-step twiddle, the coset scales, and the 1/n
normalization fused in VMEM.

Kernel design notes (Mosaic-dictated, same playbook as hash/poseidon_pallas):
  * The transform axis is the SUBLANE axis (axis -2), lanes intact.  A
    stage's partner exchange i <-> i^half is two `pltpu.roll`s over sublanes
    plus a select — no gathers, no sub-tile reshapes:
        partner[i] = x[i ^ half] = where(i&half==0, roll(x, n-half), roll(x, half))
    (np.roll semantics: roll(x, s)[i] = x[i-s]; wrap entries never selected.)
  * Bit reversal of the sublane index is a shuffle network of floor(bits/2)
    index-bit transpositions; each transposition (bit_a <-> bit_b) is again
    two rolls + selects:  y[k] = x[swap_ab(k)], swap distance 2^a - 2^b.
  * out[i] = x[A[i]] + W[i]*x[B[i]] with W from ntt._stage_tables (the same
    uniform table formulation as the jnp path; W folds the butterfly sign).
    W is passed [S, n_t, 1] and lane-broadcast in-kernel.
  * Optional `pre`/`post` elementwise tables fold the coset power scale (and
    the inverse transform's 1/n, folded into the four-step twiddle T) into
    the same launches.
  * LDE zero-padding never touches HBM: the first kernel reads the compact
    coefficient rows and concatenates constant-zero rows in VMEM
    (`rows_in < n1`), so a 4x-blowup LDE reads n coefficients, not N.

Four-step composition (ntt._ntt_four_step semantics, natural order in/out):
    x[lead, n1, n2] --A--> (NTT over n1 rows) * T[k1, j2]   (kernel 1)
      --swapaxes--> [lead, n2, n1]                          (XLA transpose)
      --B--> (NTT over n2 rows) [* post]                    (kernel 2)
    reshape [lead, n] gives natural order (k = k2*n1 + k1).

Correctness: interpret-mode parity in tests/test_prover.py; on-device parity
in scripts/tpu_checks.py.
"""

from __future__ import annotations

import functools

import numpy as np

LANE = 128
MAX_N_T = 1024


def _supported(n_t: int, L: int) -> bool:
    return (n_t >= 8 and (n_t & (n_t - 1)) == 0 and n_t <= MAX_N_T
            and L % LANE == 0)


def stage_tables(n_t: int, inverse: bool):
    """Butterfly multiplier table W as (lo, hi) u32 arrays [S, n_t, 1]."""
    from ..fields import goldilocks as gl
    from . import ntt as _ntt

    _A, _B, W = _ntt._stage_tables(n_t, inverse)
    Wlo, Whi = gl.from_u64(W)
    return Wlo[..., None], Whi[..., None]


def _bitrev_rolls(lo, hi, n_t: int):
    """In-VMEM bit-reversal of the sublane index via bit-swap rolls."""
    import jax
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu

    bits = n_t.bit_length() - 1
    row = jax.lax.broadcasted_iota(jnp.uint32, lo.shape, lo.ndim - 2)
    for a in range(bits // 2):
        b = bits - 1 - a
        d = (1 << b) - (1 << a)
        abit = (row & np.uint32(1 << a)) != 0
        bbit = (row & np.uint32(1 << b)) != 0
        same = abit == bbit
        # y[k] = x[swap_ab(k)]: bit_a=0,bit_b=1 -> x[k-d] = roll(x, d)[k];
        #                       bit_a=1,bit_b=0 -> x[k+d] = roll(x, n-d)[k]
        up = bbit
        lo = jnp.where(same, lo, jnp.where(up, pltpu.roll(lo, d, lo.ndim - 2),
                                           pltpu.roll(lo, n_t - d, lo.ndim - 2)))
        hi = jnp.where(same, hi, jnp.where(up, pltpu.roll(hi, d, hi.ndim - 2),
                                           pltpu.roll(hi, n_t - d, hi.ndim - 2)))
    return lo, hi


def _stages(lo, hi, n_t: int, w_lo_ref, w_hi_ref):
    """All log2(n_t) butterfly stages over the sublane axis, in VMEM."""
    import jax
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu

    from ..fields import goldilocks as gl

    shape = lo.shape
    ax = lo.ndim - 2
    row = jax.lax.broadcasted_iota(jnp.uint32, shape, ax)
    S = n_t.bit_length() - 1
    for s in range(S):
        half = 1 << s
        is_lo = (row & np.uint32(half)) == 0
        plo = jnp.where(is_lo, pltpu.roll(lo, n_t - half, ax),
                        pltpu.roll(lo, half, ax))
        phi = jnp.where(is_lo, pltpu.roll(hi, n_t - half, ax),
                        pltpu.roll(hi, half, ax))
        a_lo = jnp.where(is_lo, lo, plo)
        a_hi = jnp.where(is_lo, hi, phi)
        b_lo = jnp.where(is_lo, plo, lo)
        b_hi = jnp.where(is_lo, phi, hi)
        wl = jnp.broadcast_to(w_lo_ref[s], shape)
        wh = jnp.broadcast_to(w_hi_ref[s], shape)
        tlo, thi = gl.mul(b_lo, b_hi, wl, wh)
        lo, hi = gl.add(a_lo, a_hi, tlo, thi)
    return lo, hi


def _sub_ntt_kernel(n_t: int, rows_in: int, has_pre: int, has_post: int,
                    *refs):
    """One fused sub-NTT: [pre *] bitrev -> stages -> [post *].

    refs order: w_lo, w_hi, [pre_lo, pre_hi], [post_lo, post_hi],
                in_lo, in_hi, out_lo, out_hi."""
    import jax.numpy as jnp

    from ..fields import goldilocks as gl

    it = iter(refs)
    w_lo_ref, w_hi_ref = next(it), next(it)
    pre = (next(it), next(it)) if has_pre else None
    post = (next(it), next(it)) if has_post else None
    in_lo, in_hi = next(it), next(it)
    out_lo, out_hi = next(it), next(it)

    lo = in_lo[0]  # (rows_in, LB)
    hi = in_hi[0]
    if pre is not None:
        lo, hi = gl.mul(lo, hi, pre[0][...], pre[1][...])
    if rows_in < n_t:  # compact LDE coefficients: top rows are zero
        pad = jnp.zeros((n_t - rows_in,) + lo.shape[1:], jnp.uint32)
        lo = jnp.concatenate([lo, pad], 0)
        hi = jnp.concatenate([hi, pad], 0)
    lo, hi = _bitrev_rolls(lo, hi, n_t)
    lo, hi = _stages(lo, hi, n_t, w_lo_ref, w_hi_ref)
    if post is not None:
        lo, hi = gl.mul(lo, hi, post[0][...], post[1][...])
    out_lo[0] = lo
    out_hi[0] = hi


@functools.lru_cache(maxsize=None)
def _build_call(M: int, n_t: int, rows_in: int, L: int, has_pre: bool,
                has_post: bool, interpret: bool):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    S = n_t.bit_length() - 1
    LB = L if L <= 512 else 512
    while L % LB:
        LB //= 2
    w_spec = pl.BlockSpec((S, n_t, 1), lambda i, j: (0, 0, 0),
                          memory_space=pltpu.VMEM)
    in_spec = pl.BlockSpec((1, rows_in, LB), lambda i, j: (i, 0, j),
                           memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, n_t, LB), lambda i, j: (i, 0, j),
                            memory_space=pltpu.VMEM)
    in_specs = [w_spec, w_spec]
    if has_pre:
        in_specs += [pl.BlockSpec((rows_in, LB), lambda i, j: (0, j),
                                  memory_space=pltpu.VMEM)] * 2
    if has_post:
        in_specs += [pl.BlockSpec((n_t, LB), lambda i, j: (0, j),
                                  memory_space=pltpu.VMEM)] * 2
    in_specs += [in_spec, in_spec]
    shape = jax.ShapeDtypeStruct((M, n_t, L), jnp.uint32)
    kern = functools.partial(_sub_ntt_kernel, n_t, rows_in,
                             int(has_pre), int(has_post))
    return pl.pallas_call(
        kern,
        grid=(M, L // LB),
        out_shape=(shape, shape),
        in_specs=in_specs,
        out_specs=(out_spec, out_spec),
        interpret=interpret,
    )


def sub_ntt(lo, hi, n_t: int, tables, pre=None, post=None,
            interpret: bool = False):
    """Fused sub-NTT over axis -2 (natural order in AND out).

    lo/hi: [..., rows_in, L] u32 with rows_in <= n_t (missing rows = zero
    coefficients).  tables: (Wlo, Whi) [S, n_t, 1].  pre: optional elementwise
    (lo, hi) [rows_in, L] multiplied in before the transform; post: [n_t, L]
    after."""
    lead = lo.shape[:-2]
    rows_in = lo.shape[-2]
    L = lo.shape[-1]
    M = int(np.prod(lead)) if lead else 1
    flo = lo.reshape(M, rows_in, L)
    fhi = hi.reshape(M, rows_in, L)
    args = [tables[0], tables[1]]
    if pre is not None:
        args += [pre[0], pre[1]]
    if post is not None:
        args += [post[0], post[1]]
    call = _build_call(M, n_t, rows_in, L, pre is not None, post is not None,
                       interpret)
    olo, ohi = call(*args, flo, fhi)
    return olo.reshape(lead + (n_t, L)), ohi.reshape(lead + (n_t, L))


def four_step(lo, hi, n: int, inverse: bool, pre=None, post=None,
              interpret: bool = False):
    """Full fused four-step NTT over the last axis: natural in/out order.

    lo/hi: [..., k] with k <= n (k < n means zero-padded coefficients —
    forward only).  pre/post: optional elementwise (lo, hi) scale tables of
    shape [k] / [n] (coset powers); the inverse 1/n is folded into the
    four-step twiddle by the caller-provided tables below."""
    import jax.numpy as jnp

    from . import ntt as _ntt

    n1, n2 = _ntt._split2(n)
    lead = lo.shape[:-1]
    k = lo.shape[-1]
    assert k % n2 == 0, (k, n2)
    rows_in = k // n2
    lo = lo.reshape(lead + (rows_in, n2))
    hi = hi.reshape(lead + (rows_in, n2))

    w1 = _tabs(n1, inverse)
    w2 = _tabs(n2, inverse)
    Tl, Th = _fsT(n, inverse)
    if pre is not None:
        pre = (pre[0].reshape(rows_in, n2), pre[1].reshape(rows_in, n2))
    lo, hi = sub_ntt(lo, hi, n1, w1, pre=pre, post=(Tl, Th),
                     interpret=interpret)
    lo = jnp.swapaxes(lo, -1, -2)
    hi = jnp.swapaxes(hi, -1, -2)
    if post is not None:
        post = (post[0].reshape(n2, n1), post[1].reshape(n2, n1))
    lo, hi = sub_ntt(lo, hi, n2, w2, post=post, interpret=interpret)
    return lo.reshape(lead + (n,)), hi.reshape(lead + (n,))


def _tabs(n_t: int, inverse: bool):
    """Stage tables via the ntt device-table registry (jit-argument path)."""
    import jax.numpy as jnp

    from . import ntt as _ntt

    got = _ntt._tab(f"ptw:{n_t}:{int(inverse)}", lambda: None)
    if got is None:
        wl, wh = stage_tables(n_t, inverse)
        got = (jnp.asarray(wl), jnp.asarray(wh))
    return got


def _fsT(n: int, inverse: bool):
    """Four-step twiddle T[k1, j2] (with 1/n folded in for the inverse)."""
    import jax.numpy as jnp

    from ..fields import goldilocks as gl
    from . import ntt as _ntt

    key = f"fsTs:{n}" if inverse else f"fsT:{n}:0"

    def make():
        Tl, Th = _ntt._four_step_T(n, inverse)
        if inverse:
            P = gl.P
            ninv = pow(n, P - 2, P)
            Tl, Th = gl.mul(Tl, Th, *gl.from_int(ninv))
        return (jnp.asarray(Tl), jnp.asarray(Th))

    return _ntt._tab(key, make)
