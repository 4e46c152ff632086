"""Poseidon permutation over Goldilocks, width 12, x^7 S-box — vectorized.

The Merkle/transcript hash of the proof system (plonky2's
PoseidonGoldilocksConfig equivalent, SURVEY.md §2.9).  Structure matches
plonky2's instance: width 12, 8 full rounds (4+4) + 22 partial rounds, S-box
x^7, MDS = circulant(small constants) + diag so the MDS layer is all
mul-by-u32 (cheap on 32-bit TPU lanes).

Round constants are derived with the canonical Grain-LFSR procedure from the
Poseidon reference implementation (Appendix F of the Poseidon paper /
hadeshash generate_parameters_grain.sage), instantiated for
(prime field, x^alpha S-box, n=64, t=12, R_F=8, R_P=22) — the vetted
nothing-up-my-sleeve derivation the Poseidon security analysis assumes.
plonky2's own baked-in constants use a different (ChaCha-seeded) generation
and are not reproducible in this offline environment (the plonky2 crate is
not vendored, SURVEY.md §2.9), so proof-transcript bit-compat with the Rust
stack is out of scope; the MDS matrix below IS plonky2's
(MDS_MATRIX_CIRC/MDS_MATRIX_DIAG of poseidon.rs) and the round structure
matches its instance exactly.  The matrix is checked invertible at import
and its MDS property is exhaustively verified in
tests/test_prover.py (all-minors check, slow marker).

The state is carried STACKED: a single (lo, hi) u32-pair tensor with leading
axis 12, so the S-box and MDS vectorize across lanes as well as across the
hashing batch (2^18 Merkle leaves hash as [12, 2^18] tensors).
"""

from __future__ import annotations



import numpy as np

from ..fields import goldilocks as gl

WIDTH = 12
RATE = 8
HALF_FULL_ROUNDS = 4
PARTIAL_ROUNDS = 22
TOTAL_ROUNDS = 2 * HALF_FULL_ROUNDS + PARTIAL_ROUNDS  # 30

# Small circulant + diagonal MDS (plonky2-style structure: every entry fits
# u32 so row dot-products are mul-by-small chains).
MDS_CIRC = [17, 15, 41, 16, 2, 28, 13, 13, 39, 18, 34, 20]
MDS_DIAG0 = 8  # extra weight on the [0,0] entry


def _gen_round_constants():
    """Grain-LFSR round constants (Poseidon reference derivation).

    Init sequence: field tag 1 (prime field, 2 bits), sbox tag 0 (x^alpha,
    4 bits), field size 64 (12 bits), t=12 (12 bits), R_F=8 (10 bits),
    R_P=22 (10 bits), then 30 ones; 80-bit LFSR with taps
    62,51,38,23,13,0; first 160 output bits discarded; shrinking sampler
    (emit the bit following each 1, skip the bit following each 0); 64-bit
    MSB-first candidates rejection-sampled until < p."""
    bits = []

    def push(v, w):
        bits.extend((v >> (w - 1 - i)) & 1 for i in range(w))

    push(1, 2)                       # prime field
    push(0, 4)                       # x^alpha S-box
    push(64, 12)                     # field bits
    push(WIDTH, 12)                  # t
    push(2 * HALF_FULL_ROUNDS, 10)   # R_F
    push(PARTIAL_ROUNDS, 10)         # R_P
    bits.extend([1] * 30)
    state = bits[:]
    assert len(state) == 80

    def clock():
        nb = (state[62] ^ state[51] ^ state[38] ^ state[23]
              ^ state[13] ^ state[0])
        state.pop(0)
        state.append(nb)
        return nb

    for _ in range(160):
        clock()

    def next_bit():
        while True:
            if clock() == 1:
                return clock()
            clock()

    out = []
    while len(out) < WIDTH * TOTAL_ROUNDS:
        v = 0
        for _ in range(64):
            v = (v << 1) | next_bit()
        if v < gl.P:
            out.append(v)
    return out


ROUND_CONSTANTS = _gen_round_constants()
_RC_U64 = np.array(ROUND_CONSTANTS, dtype=np.uint64).reshape(TOTAL_ROUNDS, WIDTH)
_RC_LO = (_RC_U64 & np.uint64(0xFFFFFFFF)).astype(np.uint32)
_RC_HI = (_RC_U64 >> np.uint64(32)).astype(np.uint32)


def _check_mds_invertible():
    m = [[(MDS_CIRC[(j - i) % WIDTH] + (MDS_DIAG0 if (i == j == 0) else 0)) % gl.P
          for j in range(WIDTH)] for i in range(WIDTH)]
    mat = [row[:] for row in m]
    for col in range(WIDTH):
        piv = next((r for r in range(col, WIDTH) if mat[r][col]), None)
        assert piv is not None, "MDS matrix is singular"
        mat[col], mat[piv] = mat[piv], mat[col]
        inv = pow(mat[col][col], -1, gl.P)
        for r in range(col + 1, WIDTH):
            f = mat[r][col] * inv % gl.P
            if f:
                mat[r] = [(a - f * bb) % gl.P for a, bb in zip(mat[r], mat[col])]


_check_mds_invertible()


def _xp_of(lo):
    return gl._xp(lo)


def _sbox(x):
    x2 = gl.square(*x)
    x4 = gl.square(*x2)
    x3 = gl.mul(*x2, *x)
    return gl.mul(*x4, *x3)


def _mds_stacked(lo, hi, xp):
    """out_i = sum_d circ[d] * s_{(i+d) mod 12} (+ diag on lane 0)."""
    if gl._use_u64(xp):
        return _mds_stacked_u64(lo, hi, xp)
    return _mds_stacked_u32(lo, hi, xp)


def _mds_stacked_u64(lo, hi, xp):
    """u64 CPU path: accumulate circ[d] * (32-bit halves) in two u64 lanes.

    qlo = sum c*v_lo <= 264*(2^32-1) < 2^41 and likewise qhi, so both sums fit
    u64 with no carries; one 128-bit fold recombines them."""
    v = gl._join64(xp, lo, hi)
    vl = v & gl._M32
    vh = v >> np.uint64(32)
    qlo = qhi = None
    for d, c in enumerate(MDS_CIRC):
        c64 = np.uint64(c)
        tl = (vl if d == 0 else xp.roll(vl, -d, axis=0)) * c64
        th = (vh if d == 0 else xp.roll(vh, -d, axis=0)) * c64
        qlo = tl if qlo is None else qlo + tl
        qhi = th if qhi is None else qhi + th
    d0 = np.uint64(MDS_DIAG0)
    qlo = xp.concatenate([(qlo[0] + vl[0] * d0)[None], qlo[1:]], axis=0)
    qhi = xp.concatenate([(qhi[0] + vh[0] * d0)[None], qhi[1:]], axis=0)
    # value = qlo + 2^32 qhi (both < 2^41): lo64 wraps, top < 2^9
    lo64 = qlo + (qhi << np.uint64(32))
    top = (((qlo >> np.uint64(32)) + (qhi & gl._M32)) >> np.uint64(32)) + (
        qhi >> np.uint64(32))
    out = gl._reduce128_u64(xp, top, lo64)
    return gl._split64(xp, out)


_M22 = np.uint32(0x3FFFFF)
_M12 = np.uint32(0xFFF)
_M10 = np.uint32(0x3FF)
_M20 = np.uint32(0xFFFFF)


def _mds_split3(lo, hi):
    """(lo, hi) u32 pair -> three 22/22/20-bit parts (weights 2^0, 2^22,
    2^44).  Three part planes instead of four 16-bit ones: tap products
    c * part <= 41 * 2^22 < 2^28 and 264-weight accumulations < 2^30.1 still
    fit u32, and the tap-accumulate loop (the MDS hot loop) does 25% fewer
    multiply-adds."""
    p0 = lo & _M22
    p1 = (lo >> np.uint32(22)) | ((hi & _M12) << np.uint32(10))
    p2 = hi >> np.uint32(12)
    return p0, p1, p2


def _mds_recombine3(q):
    """Three u32 part-sums (weights 2^0, 2^22, 2^44; q0,q1 < 2^30.1,
    q2 < 2^28.1) -> canonical (lo, hi)."""
    q0, q1, q2 = q
    z = np.uint32(0)
    lo32, c1 = gl.addc32(q0, (q1 & _M10) << np.uint32(22))
    mid = (q1 >> np.uint32(10)) + c1             # < 2^21, no wrap
    hi32, c2 = gl.addc32(mid, (q2 & _M20) << np.uint32(12))
    top = (q2 >> np.uint32(20)) + c2             # < 2^9
    # value = lo32 + 2^32 hi32 + 2^64 top; 2^64 = 2^32 - 1 (mod p)
    ulo = z - top
    uhi = top - (top != 0).astype(np.uint32)
    l, h, c = gl.add64(lo32, hi32, ulo, uhi)
    l, h, _ = gl.add64(l, h, c * gl.EPS, c * z)
    return gl.canonicalize(l, h)


def _mds_stacked_u32(lo, hi, xp):
    """out_i = sum_d circ[d] * s_{(i+d) mod 12} (+ diag on lane 0).

    Lazy accumulation over the three 22-bit part planes (_mds_split3): all
    12 tap products accumulate in plain u32 lanes with ONE modular
    recombination per output — ~3x fewer VPU ops than 12 mul_small + 11
    modular adds."""
    parts = _mds_split3(lo, hi)
    q = [None] * 3
    for d, c in enumerate(MDS_CIRC):
        c = np.uint32(c)
        for k in range(3):
            t = (parts[k] if d == 0 else xp.roll(parts[k], -d, axis=0)) * c
            q[k] = t if q[k] is None else q[k] + t
    d0c = np.uint32(MDS_DIAG0)
    q = [xp.concatenate([(qk[0] + parts[k][0] * d0c)[None], qk[1:]], axis=0)
         for k, qk in enumerate(q)]
    return _mds_recombine3(q)


def _add_rc(lo, hi, r, xp):
    shape = (WIDTH,) + (1,) * (lo.ndim - 1)
    rl = xp.asarray(_RC_LO[r]).reshape(shape)
    rh = xp.asarray(_RC_HI[r]).reshape(shape)
    return gl.add(lo, hi, rl, rh)


def _use_pallas() -> bool:
    """Mosaic kernel on real TPU backends; jnp path on CPU (tests/verifier)."""
    import os

    if os.environ.get("PLONKY2_TPU_NO_PALLAS") == "1":
        return False
    import jax

    return jax.default_backend() not in ("cpu",)


def permute_stacked(lo, hi):
    """(lo, hi) with leading axis WIDTH -> permuted pair."""
    xp = _xp_of(lo)
    if xp is not np:
        if _use_pallas():
            from .poseidon_pallas import permute_stacked_pallas

            return permute_stacked_pallas(lo, hi)
        return _permute_stacked_jax(lo, hi)
    r = 0
    for _ in range(HALF_FULL_ROUNDS):
        lo, hi = _add_rc(lo, hi, r, xp)
        r += 1
        lo, hi = _sbox((lo, hi))
        lo, hi = _mds_stacked(lo, hi, xp)
    for _ in range(PARTIAL_ROUNDS):
        lo, hi = _add_rc(lo, hi, r, xp)
        r += 1
        s0 = _sbox((lo[0], hi[0]))
        lo = xp.concatenate([s0[0][None], lo[1:]], axis=0)
        hi = xp.concatenate([s0[1][None], hi[1:]], axis=0)
        lo, hi = _mds_stacked(lo, hi, xp)
    for _ in range(HALF_FULL_ROUNDS):
        lo, hi = _add_rc(lo, hi, r, xp)
        r += 1
        lo, hi = _sbox((lo, hi))
        lo, hi = _mds_stacked(lo, hi, xp)
    return lo, hi


_PERMUTE_JIT = None


def _permute_stacked_jax(lo, hi):
    """JAX path: the permutation body is itself jitted, so each of the ~100
    call sites in a full prove emits one cached pjit call instead of
    re-tracing ~3k primitives."""
    global _PERMUTE_JIT
    if _PERMUTE_JIT is None:
        import jax

        _PERMUTE_JIT = jax.jit(_permute_rounds_jax)
    return _PERMUTE_JIT(lo, hi)


def _permute_rounds_jax(lo, hi):
    import jax
    import jax.numpy as jnp

    rc_lo = jnp.asarray(_RC_LO)  # [30, 12]
    rc_hi = jnp.asarray(_RC_HI)
    shape_tail = (1,) * (lo.ndim - 1)

    def round_body(r, state, partial):
        lo, hi = state
        rl = rc_lo[r].reshape((WIDTH,) + shape_tail)
        rh = rc_hi[r].reshape((WIDTH,) + shape_tail)
        lo, hi = gl.add(lo, hi, rl, rh)
        if partial:
            s0 = _sbox((lo[0], hi[0]))
            lo = lo.at[0].set(s0[0])
            hi = hi.at[0].set(s0[1])
        else:
            lo, hi = _sbox((lo, hi))
        return _mds_stacked(lo, hi, jnp)

    state = (lo, hi)
    state = jax.lax.fori_loop(0, HALF_FULL_ROUNDS,
                              lambda r, s: round_body(r, s, False), state)
    state = jax.lax.fori_loop(HALF_FULL_ROUNDS, HALF_FULL_ROUNDS + PARTIAL_ROUNDS,
                              lambda r, s: round_body(r, s, True), state)
    state = jax.lax.fori_loop(HALF_FULL_ROUNDS + PARTIAL_ROUNDS, TOTAL_ROUNDS,
                              lambda r, s: round_body(r, s, False), state)
    return state


def permute(state):
    """Compatibility wrapper: list of 12 (lo, hi) pairs -> permuted list."""
    xp = _xp_of(state[0][0])
    lo = xp.stack([s[0] for s in state], axis=0)
    hi = xp.stack([s[1] for s in state], axis=0)
    lo, hi = permute_stacked(lo, hi)
    return [(lo[i], hi[i]) for i in range(WIDTH)]


def hash_no_pad(elems):
    """Sponge over a list of (lo,hi) pairs (overwrite mode, rate 8) -> 4-pair
    digest list.  plonky2 hash_n_to_hash_no_pad equivalent.

    Under JAX the full-rate absorb chunks run as one lax.scan so the traced
    program holds a single permutation body per sponge call site."""
    assert elems
    xp = _xp_of(elems[0][0])
    zlo = xp.zeros_like(elems[0][0])
    zhi = xp.zeros_like(elems[0][1])
    lo = xp.stack([zlo] * WIDTH, axis=0)
    hi = xp.stack([zhi] * WIDTH, axis=0)
    nfull = len(elems) // RATE
    if xp is not np and nfull > 1:
        import jax

        clo = xp.stack([xp.stack([xp.broadcast_to(elems[i * RATE + j][0], zlo.shape)
                                  for j in range(RATE)], 0) for i in range(nfull)], 0)
        chi = xp.stack([xp.stack([xp.broadcast_to(elems[i * RATE + j][1], zhi.shape)
                                  for j in range(RATE)], 0) for i in range(nfull)], 0)

        def body(state, chunk):
            slo, shi = state
            slo = xp.concatenate([chunk[0], slo[RATE:]], axis=0)
            shi = xp.concatenate([chunk[1], shi[RATE:]], axis=0)
            return permute_stacked(slo, shi), None

        (lo, hi), _ = jax.lax.scan(body, (lo, hi), (clo, chi))
        rest = elems[nfull * RATE:]
    else:
        rest = None
        for off in range(0, len(elems), RATE):
            chunk = elems[off : off + RATE]
            clo = xp.stack([xp.broadcast_to(e[0], zlo.shape) for e in chunk], axis=0)
            chi = xp.stack([xp.broadcast_to(e[1], zhi.shape) for e in chunk], axis=0)
            lo = xp.concatenate([clo, lo[len(chunk):]], axis=0)
            hi = xp.concatenate([chi, hi[len(chunk):]], axis=0)
            lo, hi = permute_stacked(lo, hi)
    if rest:
        clo = xp.stack([xp.broadcast_to(e[0], zlo.shape) for e in rest], axis=0)
        chi = xp.stack([xp.broadcast_to(e[1], zhi.shape) for e in rest], axis=0)
        lo = xp.concatenate([clo, lo[len(rest):]], axis=0)
        hi = xp.concatenate([chi, hi[len(rest):]], axis=0)
        lo, hi = permute_stacked(lo, hi)
    return [(lo[i], hi[i]) for i in range(4)]


def two_to_one(left, right):
    """Compress two 4-pair digests -> 4-pair digest."""
    return hash_no_pad(list(left) + list(right))
