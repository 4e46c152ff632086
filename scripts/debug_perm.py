"""Isolate the B=32 zs divergence: run perm-Z / lookup subcomputations with
the real witness at B=32 on device vs numpy host oracle, compare lane 0.

STAGE env: perm | permsub | lookup
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
from plonky2_ecdsa_tpu.prover import ntt, prover
from plonky2_ecdsa_tpu.prover.prover import (
    Backend, _register_pytrees, _batch_inverse_axis1, _bc, _chunk_prod,
    _lookup_polys_all, _prefix_prod_exclusive, host_prep, prover_tables,
    prove_core)

STAGE = os.environ.get("STAGE", "perm")
B = int(os.environ.get("BB", "32"))

system = api.EcdsaProverSystem(cn.SECP256K1)
data = system.data
_register_pytrees()
circuit = data.circuit
cfg = circuit.config
n = data.n
C = cfg.num_challenges
nr = cfg.num_routed_wires
chunk = cfg.permutation_chunk_size
nchunks = nr // chunk

stmts = api.random_statements(cn.SECP256K1, B, seed=3)
W, pis = system.witness(stmts)
wires_pair, pi_pair, pis_pair = host_prep(data, W, pis)

# challenges from the (verified-identical) device transcript, via host numpy:
# recompute them on HOST cheaply from the known-good caps... we instead just
# use fixed synthetic challenge values — divergence is data-independent math,
# and using the same values on both sides keeps the comparison exact.
rng = np.random.default_rng(77)
def chs():
    v = rng.integers(0, gl.P, size=(B,), dtype=np.uint64)
    return gl.from_u64(v)
betas = [chs() for _ in range(C)]
gammas = [chs() for _ in range(C)]
lk_alphas = [chs() for _ in range(C)]

bk_np = Backend(data, np)


def perm_z(wires_pair, bk_ids, bk_sig, betas, gammas, xp):
    routed = (wires_pair[0][:, :nr], wires_pair[1][:, :nr])
    rshape = routed[0].shape
    out = []
    for c in range(C):
        beta = (betas[c][0][:, None, None], betas[c][1][:, None, None])
        gamma = (gammas[c][0][:, None, None], gammas[c][1][:, None, None])
        bid = gl.mul(*_bc(bk_ids, rshape, xp), *_bc(beta, rshape, xp))
        bsg = gl.mul(*_bc(bk_sig, rshape, xp), *_bc(beta, rshape, xp))
        f = gl.add(*gl.add(*routed, *bid), *_bc(gamma, rshape, xp))
        g_ = gl.add(*gl.add(*routed, *bsg), *_bc(gamma, rshape, xp))
        fP = _chunk_prod(f, chunk)
        gP = _chunk_prod(g_, chunk)
        ginv = _batch_inverse_axis1(gP, xp)
        quot = gl.mul(*fP, *ginv)
        Rlo, Rhi = [quot[0][:, 0]], [quot[1][:, 0]]
        for t in range(1, nchunks):
            nl, nh = gl.mul(Rlo[-1], Rhi[-1], quot[0][:, t], quot[1][:, t])
            Rlo.append(nl)
            Rhi.append(nh)
        zlo, zhi = _prefix_prod_exclusive(Rlo[-1], Rhi[-1], xp)
        out.append(("fP", fP))
        out.append(("gP", gP))
        out.append(("ginv", ginv))
        out.append(("quot", quot))
        out.append(("R", (Rlo[-1], Rhi[-1])))
        out.append(("Z", (zlo, zhi)))
    return out


def run_dev_perm():
    @jax.jit
    def f(wp, ids, sig, betas, gammas):
        return [p for _, p in perm_z(wp, ids, sig, betas, gammas, jnp)]

    wp = (jnp.asarray(wires_pair[0]), jnp.asarray(wires_pair[1]))
    ids = (jnp.asarray(bk_np.ids[0]), jnp.asarray(bk_np.ids[1]))
    sig = (jnp.asarray(bk_np.sig[0]), jnp.asarray(bk_np.sig[1]))
    bt = [(jnp.asarray(b[0]), jnp.asarray(b[1])) for b in betas]
    gm = [(jnp.asarray(g[0]), jnp.asarray(g[1])) for g in gammas]
    return jax.device_get(f(wp, ids, sig, bt, gm))


if STAGE == "perm":
    host = perm_z(wires_pair, bk_np.ids, bk_np.sig, betas, gammas, np)
    dev = run_dev_perm()
    for (name, h), d in zip(host, dev):
        same = np.array_equal(np.asarray(d[0]), h[0]) and \
            np.array_equal(np.asarray(d[1]), h[1])
        if not same:
            lanes = sorted({int(i) for i in
                            np.argwhere(np.asarray(d[0]) != h[0])[:, 0]})
            print(f"{name}: DIFF (lanes {lanes[:8]}...)")
        else:
            print(f"{name}: same")
elif STAGE == "permdet":
    d1 = run_dev_perm()
    d2 = run_dev_perm()
    for i, (a, b) in enumerate(zip(d1, d2)):
        same = np.array_equal(np.asarray(a[0]), np.asarray(b[0])) and \
            np.array_equal(np.asarray(a[1]), np.asarray(b[1]))
        print(f"piece {i}: {'deterministic' if same else 'NONDETERMINISTIC'}")
elif STAGE == "permsyn":
    rng2 = np.random.default_rng(123)
    v = rng2.integers(0, gl.P, size=wires_pair[0].shape, dtype=np.uint64)
    wires_pair = gl.from_u64(v)
    host = perm_z(wires_pair, bk_np.ids, bk_np.sig, betas, gammas, np)
    dev = run_dev_perm()
    for (name, h), d in zip(host, dev):
        same = np.array_equal(np.asarray(d[0]), h[0]) and \
            np.array_equal(np.asarray(d[1]), h[1])
        print(f"{name}: {'same' if same else 'DIFF'}")
elif STAGE == "binvreal":
    # real gP, jit only the batch inverse
    routed = (wires_pair[0][:, :nr], wires_pair[1][:, :nr])
    rshape = routed[0].shape
    c = 0
    beta = (betas[c][0][:, None, None], betas[c][1][:, None, None])
    gamma = (gammas[c][0][:, None, None], gammas[c][1][:, None, None])
    bsg = gl.mul(*_bc(bk_np.sig, rshape, np), *_bc(beta, rshape, np))
    g_ = gl.add(*gl.add(*routed, *bsg), *_bc(gamma, rshape, np))
    gP = _chunk_prod(g_, chunk)
    np.savez("/tmp/r3cache/gP.npz", lo=gP[0], hi=gP[1])
    hinv = _batch_inverse_axis1(gP, np)

    @jax.jit
    def f(p):
        return _batch_inverse_axis1(p, jnp)

    dinv = jax.device_get(f((jnp.asarray(gP[0]), jnp.asarray(gP[1]))))
    same = np.array_equal(np.asarray(dinv[0]), hinv[0]) and \
        np.array_equal(np.asarray(dinv[1]), hinv[1])
    print(f"binv(real gP) dev vs host: {'same' if same else 'DIFF'}")
    if not same:
        d = np.asarray(dinv[0]) != hinv[0]
        print("diff count", d.sum(), "of", d.size, "first", np.argwhere(d)[:5])
elif STAGE == "lookup":
    lk = data.lookup
    host = _lookup_polys_all(data, lk, wires_pair, lk_alphas, np)

    @jax.jit
    def f(wp, alphas):
        return _lookup_polys_all(data, lk, wp, alphas, jnp)

    wp = (jnp.asarray(wires_pair[0]), jnp.asarray(wires_pair[1]))
    al = [(jnp.asarray(a[0]), jnp.asarray(a[1])) for a in lk_alphas]
    dev = jax.device_get(f(wp, al))
    for c in range(len(host)):
        for j, (h, d) in enumerate(zip(host[c], dev[c])):
            same = np.array_equal(np.asarray(d[0]), h[0]) and \
                np.array_equal(np.asarray(d[1]), h[1])
            print(f"c{c} col{j}: {'same' if same else 'DIFF'}")
