"""Fiat-Shamir challenger: Poseidon duplex sponge, batched.

plonky2 Challenger equivalent (overwrite-mode duplex, rate 8).  All observed
values and squeezed challenges are (lo, hi) u32-pair arrays with an arbitrary
shared batch shape, so one instance drives a whole proof batch; the verifier
uses batch shape ().
"""

from __future__ import annotations

import numpy as np

from ..fields import goldilocks as gl
from ..hash import poseidon


class Challenger:
    def __init__(self, xp=np, batch_shape=()):
        self.xp = xp
        self.batch_shape = tuple(batch_shape)
        z = xp.zeros(self.batch_shape, dtype=xp.uint32)
        self.state = [(z, z) for _ in range(poseidon.WIDTH)]
        self.inputs: list = []
        self.outputs: list = []

    def _bc(self, pair):
        lo = self.xp.broadcast_to(self.xp.asarray(pair[0], dtype=self.xp.uint32), self.batch_shape)
        hi = self.xp.broadcast_to(self.xp.asarray(pair[1], dtype=self.xp.uint32), self.batch_shape)
        return (lo, hi)

    def observe(self, pair):
        self.inputs.append(self._bc(pair))
        self.outputs = []
        if len(self.inputs) == poseidon.RATE:
            self._duplex()

    def observe_elements(self, pairs):
        for p in pairs:
            self.observe(p)

    def observe_u64(self, vals):
        """vals: uint64 array broadcastable to batch shape (host arrays)."""
        arr = np.broadcast_to(np.asarray(vals, dtype=np.uint64), self.batch_shape)
        self.observe(gl.from_u64(arr))

    def observe_cap(self, cap):
        """cap: (lo, hi) arrays [..., C, 4]."""
        lo, hi = cap
        C = lo.shape[-2]
        for i in range(C):
            for j in range(4):
                self.observe((lo[..., i, j], hi[..., i, j]))

    def observe_ext(self, ext):
        self.observe(ext[0])
        self.observe(ext[1])

    def _duplex(self):
        for i, p in enumerate(self.inputs):
            self.state[i] = p
        self.state = poseidon.permute(self.state)
        self.inputs = []
        self.outputs = list(self.state[: poseidon.RATE])

    def get_challenge(self):
        if self.inputs or not self.outputs:
            self._duplex()
        return self.outputs.pop()

    def get_ext(self):
        a = self.get_challenge()
        b = self.get_challenge()
        return (a, b)

    def get_n_challenges(self, k):
        return [self.get_challenge() for _ in range(k)]

    def get_indices(self, domain_size: int, count: int):
        """count index arrays in [0, domain_size) (power of two: low bits)."""
        assert domain_size & (domain_size - 1) == 0
        mask = np.uint32(domain_size - 1)
        out = []
        for _ in range(count):
            lo, _hi = self.get_challenge()
            out.append(lo & mask)
        return out  # list of [batch] uint32 arrays

    # ------------------------------------------------------------------ PoW
    # FRI proof-of-work grinding (plonky2 fri proof_of_work_bits equivalent,
    # SURVEY.md §2.9 FRI params).  Protocol step shared by prover + verifier:
    # flush pending absorbs, then the response to witness w is the challenge
    # produced by observe(w); get_challenge().  Valid iff the top `pow_bits`
    # bits of the 64-bit response are zero.

    def check_pow(self, wpair, pow_bits: int):
        """Absorb witness pair [batch], return bool [batch] response check.
        Mutates the transcript exactly like the prover's grind."""
        assert 0 < pow_bits <= 32
        if self.inputs:
            self._duplex()
        self.observe(self._bc(wpair))
        _lo, hi = self.get_challenge()
        return (hi >> np.uint32(32 - pow_bits)) == 0

    def grind(self, pow_bits: int, chunk_log2: int = None, max_chunks: int = 4096):
        """Search (vectorized over candidates) for a per-lane witness whose
        response clears pow_bits leading zero bits; absorb it and return the
        witness pair.  TPU path: candidate axis of 2^chunk_log2 Poseidon
        permutations per while_loop step — the grind replaces plonky2's
        sequential per-thread search (rayon) with one wide tensor sweep."""
        assert 0 < pow_bits <= 32
        if chunk_log2 is None:
            # ~2^(pow_bits+4) candidates/sweep: per-lane miss prob e^-16/chunk
            chunk_log2 = min(15, pow_bits + 4)
        if self.inputs:
            self._duplex()
        xp = self.xp
        lo = xp.stack([s[0] for s in self.state], 0)  # [12, *batch]
        hi = xp.stack([s[1] for s in self.state], 0)
        shift = np.uint32(32 - pow_bits)
        M = 1 << chunk_log2
        bshape = self.batch_shape
        full = (poseidon.WIDTH,) + bshape + (M,)
        if xp is np:
            found = np.zeros(bshape, bool)
            w = np.zeros(bshape, np.uint32)
            k = 0
            while not found.all():
                assert k < max_chunks, "PoW grind exhausted candidate space"
                base = np.uint32(k << chunk_log2)
                cand = base + np.arange(M, dtype=np.uint32)
                slo = np.broadcast_to(lo[..., None], full).copy()
                shi = np.broadcast_to(hi[..., None], full).copy()
                slo[0] = np.broadcast_to(cand, bshape + (M,))
                shi[0] = 0
                _plo, phi = poseidon.permute_stacked(slo, shi)
                ok = (phi[7] >> shift) == 0  # [*batch, M]
                anyok = ok.any(-1)
                first = ok.argmax(-1).astype(np.uint32)
                w = np.where(~found & anyok, base + first, w)
                found |= anyok
                k += 1
        else:
            import jax
            import jax.numpy as jnp

            def cond(carry):
                found, _w, k = carry
                return jnp.logical_and(k < max_chunks, ~found.all())

            def body(carry):
                found, w, k = carry
                base = k.astype(jnp.uint32) << np.uint32(chunk_log2)
                cand = base + jax.lax.broadcasted_iota(
                    jnp.uint32, bshape + (M,), len(bshape))
                slo = jnp.broadcast_to(lo[..., None], full).at[0].set(cand)
                shi = jnp.broadcast_to(hi[..., None], full).at[0].set(0)
                _plo, phi = poseidon.permute_stacked(slo, shi)
                ok = (phi[7] >> shift) == 0
                anyok = ok.any(-1)
                first = jnp.argmax(ok, axis=-1).astype(jnp.uint32)
                w = jnp.where(jnp.logical_and(~found, anyok), base + first, w)
                return (jnp.logical_or(found, anyok), w, k + 1)

            found0 = jnp.zeros(bshape, bool)
            w0 = jnp.zeros(bshape, jnp.uint32)
            _found, w, _ = jax.lax.while_loop(cond, body, (found0, w0, jnp.int32(0)))
        wpair = (xp.asarray(w, dtype=xp.uint32), xp.zeros(bshape, xp.uint32))
        self.observe(wpair)
        self.get_challenge()  # consume the (zero-prefixed) response
        return wpair
