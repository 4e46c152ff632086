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
