"""Shrink the B=32 miscompile repro: variants of wires -> gP -> ginv.

v1: return ginv only (c0)            v2: return (gP, ginv)
v3: ginv with optimization_barrier on gP
v4: ginv computed from g_ without chunk-prod moveaxis form
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from plonky2_ecdsa_tpu.jaxcfg import setup_cache

setup_cache()

import jax
import jax.numpy as jnp

from plonky2_ecdsa_tpu import api
from plonky2_ecdsa_tpu.curve import native as cn
from plonky2_ecdsa_tpu.fields import goldilocks as gl
from plonky2_ecdsa_tpu.prover.prover import (
    Backend, _register_pytrees, _batch_inverse_axis1, _bc, _chunk_prod,
    host_prep)

B = int(os.environ.get("BB", "32"))
system = api.EcdsaProverSystem(cn.SECP256K1)
data = system.data
_register_pytrees()
cfg = data.circuit.config
nr = cfg.num_routed_wires
chunk = cfg.permutation_chunk_size

stmts = api.random_statements(cn.SECP256K1, B, seed=3)
W, pis = system.witness(stmts)
wires_pair, _, _ = host_prep(data, W, pis)
bk_np = Backend(data, np)

rng = np.random.default_rng(77)
v = rng.integers(0, gl.P, size=(B,), dtype=np.uint64)
beta = gl.from_u64(v)
v = rng.integers(0, gl.P, size=(B,), dtype=np.uint64)
gamma = gl.from_u64(v)


def gP_of(wp, sig, beta, gamma, xp):
    routed = (wp[0][:, :nr], wp[1][:, :nr])
    rshape = routed[0].shape
    b2 = (beta[0][:, None, None], beta[1][:, None, None])
    g2 = (gamma[0][:, None, None], gamma[1][:, None, None])
    bsg = gl.mul(*_bc(sig, rshape, xp), *_bc(b2, rshape, xp))
    g_ = gl.add(*gl.add(*routed, *bsg), *_bc(g2, rshape, xp))
    return _chunk_prod(g_, chunk)


host_gP = gP_of(wires_pair, bk_np.sig, beta, gamma, np)
host_inv = _batch_inverse_axis1(host_gP, np)

wp_d = (jnp.asarray(wires_pair[0]), jnp.asarray(wires_pair[1]))
sig_d = (jnp.asarray(bk_np.sig[0]), jnp.asarray(bk_np.sig[1]))
bd = (jnp.asarray(beta[0]), jnp.asarray(beta[1]))
gd = (jnp.asarray(gamma[0]), jnp.asarray(gamma[1]))


def check(name, got, want):
    got = jax.device_get(got)
    same = np.array_equal(np.asarray(got[0]), want[0]) and \
        np.array_equal(np.asarray(got[1]), want[1])
    print(f"{name}: {'same' if same else 'DIFF'}", flush=True)


@jax.jit
def v1(wp, sig, beta, gamma):
    return _batch_inverse_axis1(gP_of(wp, sig, beta, gamma, jnp), jnp)


@jax.jit
def v2(wp, sig, beta, gamma):
    gP = gP_of(wp, sig, beta, gamma, jnp)
    return gP, _batch_inverse_axis1(gP, jnp)


@jax.jit
def v3(wp, sig, beta, gamma):
    gP = gP_of(wp, sig, beta, gamma, jnp)
    gP = tuple(jax.lax.optimization_barrier(gP))
    return _batch_inverse_axis1(gP, jnp)


check("v1 ginv-only", v1(wp_d, sig_d, bd, gd), host_inv)
g2 = v2(wp_d, sig_d, bd, gd)
check("v2 gP", g2[0], host_gP)
check("v2 ginv", g2[1], host_inv)
check("v3 barrier", v3(wp_d, sig_d, bd, gd), host_inv)
