"""Micro-repro: device transcript (Challenger) at B=4 vs B=32 with identical
lane-0 data.  Mimics the prover's absorb sequence before the zs stage."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from plonky2_ecdsa_tpu.jaxcfg import setup_cache

setup_cache()

import jax
import jax.numpy as jnp

from plonky2_ecdsa_tpu.fields import goldilocks as gl
from plonky2_ecdsa_tpu.prover.challenger import Challenger

rng = np.random.default_rng(11)


def mk(shape):
    v = rng.integers(0, gl.P, size=shape, dtype=np.uint64)
    return gl.from_u64(v)


# lane-0-identical data: generate [32, ...] then slice
cap1 = mk((32, 64, 4))
pis = mk((32, 45))
cap2 = mk((32, 64, 4))


def challenges(cap1, pis, cap2):
    B = cap1[0].shape[0]
    ch = Challenger(jnp, (B,))
    ch.observe_cap(cap1)
    ch.observe_array(pis)
    ch.observe_cap(cap2)
    out = [ch.get_challenge() for _ in range(6)]
    return out


jch = jax.jit(challenges)


def run(B):
    sl = lambda p: (jnp.asarray(p[0][:B]), jnp.asarray(p[1][:B]))
    return jax.device_get(jch(sl(cap1), sl(pis), sl(cap2)))


r4 = run(4)
r32 = run(32)
for i, (a, b) in enumerate(zip(r4, r32)):
    same = np.array_equal(np.asarray(a[0])[0], np.asarray(b[0])[0]) and \
        np.array_equal(np.asarray(a[1])[0], np.asarray(b[1])[0])
    print(f"challenge {i}: {'same' if same else 'DIFF'}")

# host oracle
chh = Challenger(np, (4,))
chh.observe_cap((np.asarray(cap1[0][:4]), np.asarray(cap1[1][:4])))
chh.observe_array((np.asarray(pis[0][:4]), np.asarray(pis[1][:4])))
chh.observe_cap((np.asarray(cap2[0][:4]), np.asarray(cap2[1][:4])))
hh = [chh.get_challenge() for _ in range(6)]
for i, (a, h) in enumerate(zip(r4, hh)):
    same = np.array_equal(np.asarray(a[0])[0], h[0][0]) and \
        np.array_equal(np.asarray(a[1])[0], h[1][0])
    print(f"challenge {i} dev4 vs host: {'same' if same else 'DIFF'}")
