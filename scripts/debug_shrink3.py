"""Third shrink round: barrier placement + sub-piece diagnosis for the v4
miscompile (full-c0 perm pipeline at B=32)."""
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
    _prefix_prod_exclusive, host_prep)

B = int(os.environ.get("BB", "32"))
system = api.EcdsaProverSystem(cn.SECP256K1)
data = system.data
_register_pytrees()
cfg = data.circuit.config
nr = cfg.num_routed_wires
chunk = cfg.permutation_chunk_size
nchunks = nr // chunk

stmts = api.random_statements(cn.SECP256K1, B, seed=3)
W, pis = system.witness(stmts)
wires_pair, _, _ = host_prep(data, W, pis)
bk_np = Backend(data, np)

rng = np.random.default_rng(77)
draws = [gl.from_u64(rng.integers(0, gl.P, size=(B,), dtype=np.uint64))
         for _ in range(6)]
beta, gamma = draws[0], draws[2]


def binv_pieces(pair, xp):
    lo, hi = pair
    plo, phi = xp.moveaxis(lo, 1, -1), xp.moveaxis(hi, 1, -1)
    pre = _prefix_prod_exclusive(plo, phi, xp)
    suf = _prefix_prod_exclusive(plo[..., ::-1], phi[..., ::-1], xp)
    suf = (suf[0][..., ::-1], suf[1][..., ::-1])
    tot = gl.mul(pre[0][..., -1], pre[1][..., -1], plo[..., -1], phi[..., -1])
    tinv = gl.inverse(*tot)
    a = gl.mul(*pre, *suf)
    o = gl.mul(*a, tinv[0][..., None], tinv[1][..., None])
    inv = (xp.moveaxis(o[0], -1, 1), xp.moveaxis(o[1], -1, 1))
    return inv, {"pre": pre, "suf": suf, "tot": tot, "tinv": tinv}


def stagefn(wp, ids, sig, beta, gamma, xp, *, barrier, diag):
    routed = (wp[0][:, :nr], wp[1][:, :nr])
    rshape = routed[0].shape
    b2 = (beta[0][:, None, None], beta[1][:, None, None])
    g2 = (gamma[0][:, None, None], gamma[1][:, None, None])
    out = {}
    bid = gl.mul(*_bc(ids, rshape, xp), *_bc(b2, rshape, xp))
    f = gl.add(*gl.add(*routed, *bid), *_bc(g2, rshape, xp))
    fP = _chunk_prod(f, chunk)
    bsg = gl.mul(*_bc(sig, rshape, xp), *_bc(b2, rshape, xp))
    g_ = gl.add(*gl.add(*routed, *bsg), *_bc(g2, rshape, xp))
    gP = _chunk_prod(g_, chunk)
    if diag:
        ginv, pieces = binv_pieces(gP, xp)
        out.update(pieces)
    else:
        ginv = _batch_inverse_axis1(gP, xp)
    if barrier == "after":
        ginv = tuple(jax.lax.optimization_barrier(ginv)) if xp is jnp else ginv
    out["ginv"] = ginv
    quot = gl.mul(*fP, *ginv)
    out["quot"] = quot
    Rlo, Rhi = [quot[0][:, 0]], [quot[1][:, 0]]
    for t in range(1, nchunks):
        nl, nh = gl.mul(Rlo[-1], Rhi[-1], quot[0][:, t], quot[1][:, t])
        Rlo.append(nl)
        Rhi.append(nh)
    out["R"] = (Rlo[-1], Rhi[-1])
    zlo, zhi = _prefix_prod_exclusive(Rlo[-1], Rhi[-1], xp)
    out["Z"] = (zlo, zhi)
    return out


wp_d = (jnp.asarray(wires_pair[0]), jnp.asarray(wires_pair[1]))
ids_d = (jnp.asarray(bk_np.ids[0]), jnp.asarray(bk_np.ids[1]))
sig_d = (jnp.asarray(bk_np.sig[0]), jnp.asarray(bk_np.sig[1]))
bd = (jnp.asarray(beta[0]), jnp.asarray(beta[1]))
gd = (jnp.asarray(gamma[0]), jnp.asarray(gamma[1]))


def run(name, barrier, diag):
    host = stagefn(wires_pair, bk_np.ids, bk_np.sig, beta, gamma, np,
                   barrier=None, diag=diag)
    fj = jax.jit(lambda *a: stagefn(*a, jnp, barrier=barrier, diag=diag))
    dev = jax.device_get(fj(wp_d, ids_d, sig_d, bd, gd))
    bad = [k for k in host
           if not (np.array_equal(np.asarray(dev[k][0]), host[k][0])
                   and np.array_equal(np.asarray(dev[k][1]), host[k][1]))]
    print(f"{name}: {'ALL SAME' if not bad else 'DIFF in ' + str(bad)}",
          flush=True)


run("v4b barrier-after-ginv", "after", False)
run("v4d diag pieces", None, True)
