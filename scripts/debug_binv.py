"""Micro-bisect _batch_inverse_axis1 on device vs host with synthetic data.

Pieces: pre/suf prefix-products, tot, tinv (Fermat ladder), final muls.
Sweep batch sizes to find the threshold."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from plonky2_ecdsa_tpu.jaxcfg import setup_cache

setup_cache()

import jax
import jax.numpy as jnp

from plonky2_ecdsa_tpu.fields import goldilocks as gl
from plonky2_ecdsa_tpu.prover.prover import (_batch_inverse_axis1,
                                             _prefix_prod_exclusive,
                                             _suffix_prod_exclusive)

rng = np.random.default_rng(5)
K = int(os.environ.get("K", "20"))
N = int(os.environ.get("N", "8192"))


def pieces(pair, xp):
    lo, hi = pair
    plo, phi = xp.moveaxis(lo, 1, -1), xp.moveaxis(hi, 1, -1)  # [B, n, k]
    pre = _prefix_prod_exclusive(plo, phi, xp)
    suf = _suffix_prod_exclusive(plo, phi, xp)
    tot = gl.mul(pre[0][..., -1], pre[1][..., -1], plo[..., -1], phi[..., -1])
    tinv = gl.inverse(*tot)
    a = gl.mul(*pre, *suf)
    o = gl.mul(*a, tinv[0][..., None], tinv[1][..., None])
    return {"pre": pre, "suf": suf, "tot": tot, "tinv": tinv, "a": a, "o": o}


for B in (4, 8, 16, 32):
    v = rng.integers(1, gl.P, size=(B, K, N), dtype=np.uint64)
    pair = gl.from_u64(v)
    host = pieces(pair, np)
    jf = jax.jit(lambda p: pieces(p, jnp))
    dev = jax.device_get(jf((jnp.asarray(pair[0]), jnp.asarray(pair[1]))))
    bad = []
    for k in ("pre", "suf", "tot", "tinv", "a", "o"):
        same = np.array_equal(np.asarray(dev[k][0]), host[k][0]) and \
            np.array_equal(np.asarray(dev[k][1]), host[k][1])
        if not same:
            bad.append(k)
    print(f"B={B} K={K} N={N}: {'ALL SAME' if not bad else 'DIFF in ' + str(bad)}",
          flush=True)
