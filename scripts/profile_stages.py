"""Time individual prover kernels on the attached device at real ECDSA shapes.

Synthetic data, per-kernel jits: isolates NTT / Merkle(Poseidon) / quotient-ish
elementwise cost so optimization effort goes where the time is.

Usage: python scripts/profile_stages.py [B]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from plonky2_ecdsa_tpu.jaxcfg import setup_cache

setup_cache()

import jax
import jax.numpy as jnp

from plonky2_ecdsa_tpu.fields import goldilocks as gl
from plonky2_ecdsa_tpu.hash import merkle
from plonky2_ecdsa_tpu.prover import ntt


def _checksummed(fn):
    """Wrap fn so the jitted computation ends in a scalar checksum: reading
    that scalar back forces true completion (block_until_ready alone may ack
    before completion on the remote axon tunnel) without shipping the full
    output over the wire."""
    def wrapped(*args):
        out = fn(*args)
        leaves = jax.tree_util.tree_leaves(out)
        acc = None
        for leaf in leaves:
            s = jnp.sum(leaf.astype(jnp.uint32)) if leaf.dtype != jnp.uint32 else jnp.sum(leaf)
            acc = s if acc is None else acc + s
        return acc
    return wrapped


def timeit(label, fn, *args, reps=3):
    jfn = jax.jit(_checksummed(fn))
    np.asarray(jfn(*args))
    t0 = time.time()
    for _ in range(reps):
        np.asarray(jfn(*args))
    dt = (time.time() - t0) / reps
    print(f"{label:40s} {dt*1e3:10.1f} ms")
    return dt


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    n, N = 1 << 15, 1 << 18
    wires = 136
    print(f"platform={jax.devices()[0].platform} B={B} n={n} N={N} wires={wires}")
    rng = np.random.default_rng(0)

    def rand_pair(shape):
        v = rng.integers(0, gl.P, size=shape, dtype=np.uint64)
        lo, hi = gl.from_u64(v)
        return jnp.asarray(lo), jnp.asarray(hi)

    tabs = ntt.host_tables([n, N])
    tabs = jax.tree_util.tree_map(jnp.asarray, tabs)

    def with_tabs(f):
        def g(*a):
            tok = ntt._DEVICE_TABLES.set(tabs)
            try:
                return f(*a)
            finally:
                ntt._DEVICE_TABLES.reset(tok)
        return g

    # --- elementwise mul baseline: one gl.mul over the big LDE tensor -------
    xl, xh = rand_pair((B, wires, N))
    yl, yh = rand_pair((B, wires, N))
    mul_j = jax.jit(lambda a, b, c, d: gl.mul(a, b, c, d))
    t = timeit(f"gl.mul [B,{wires},N]", mul_j, xl, xh, yl, yh)
    nmul = B * wires * N
    print(f"  -> {nmul/t/1e9:.2f} G goldilocks-muls/s")

    # --- intt at n --------------------------------------------------------
    wl, wh = rand_pair((B, wires, n))
    intt_j = jax.jit(with_tabs(lambda a, b: ntt.intt(a, b)))
    timeit(f"intt [B,{wires},n]", intt_j, wl, wh)

    # --- coset ntt at N ----------------------------------------------------
    cl, ch = rand_pair((B, wires, N))
    ntt_j = jax.jit(with_tabs(lambda a, b: ntt.coset_ntt_from_coeffs(a, b)))
    timeit(f"coset_ntt [B,{wires},N]", ntt_j, cl, ch)

    # --- merkle tree over wires LDE -----------------------------------------
    ll, lh = rand_pair((B, N, wires))
    mk_j = jax.jit(lambda a, b: merkle.build_merkle_tree(a, b, 4).levels[-1])
    timeit(f"merkle [B,N,{wires}]", mk_j, ll, lh)

    # --- merkle leaf hash only ----------------------------------------------
    hl_j = jax.jit(lambda a, b: merkle.hash_leaves(a, b))
    timeit(f"hash_leaves [B,N,{wires}]", hl_j, ll, lh)

    # --- smaller merkle (zs / quotient trees) -------------------------------
    zl, zh = rand_pair((B, N, 20))
    mk2_j = jax.jit(lambda a, b: merkle.build_merkle_tree(a, b, 4).levels[-1])
    timeit("merkle [B,N,20]", mk2_j, zl, zh)


if __name__ == "__main__":
    main()
