"""On-device TPU sanity and parity checks (run manually on a TPU host).

Verifies the Pallas kernels against the numpy reference math on the real
chip, then prints primitive-op throughput numbers.  CPU-safe: falls back to
interpret mode when no TPU backend is available.

Usage: python scripts/tpu_checks.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from plonky2_ecdsa_tpu.fields import goldilocks as gl
    from plonky2_ecdsa_tpu.hash import poseidon as ps
    from plonky2_ecdsa_tpu.hash.poseidon_pallas import permute_stacked_pallas

    on_tpu = jax.default_backend() not in ("cpu",)
    print(f"backend={jax.default_backend()} devices={jax.devices()}")
    rng = np.random.default_rng(0xECD5A)

    # --- Pallas Poseidon parity vs numpy reference -------------------------
    for shape in [(1,), (7, 33), (2, 8192)]:
        v = rng.integers(0, gl.P, (12,) + shape, dtype=np.uint64)
        lo, hi = gl.from_u64(v)
        ref = ps.permute_stacked(lo, hi)  # numpy reference path
        out = permute_stacked_pallas(jnp.asarray(lo), jnp.asarray(hi),
                                     interpret=not on_tpu)
        ok = (np.array_equal(np.asarray(out[0]), ref[0])
              and np.array_equal(np.asarray(out[1]), ref[1]))
        print(f"poseidon pallas parity {shape}: {'OK' if ok else 'FAIL'}")
        assert ok

    # --- gl.mul parity on device -------------------------------------------
    a = rng.integers(0, gl.P, 1 << 16, dtype=np.uint64)
    b = rng.integers(0, gl.P, 1 << 16, dtype=np.uint64)
    ap, bp = gl.from_u64(a), gl.from_u64(b)
    dev = jax.jit(lambda al, ah, bl, bh: gl.mul(al, ah, bl, bh))(
        jnp.asarray(ap[0]), jnp.asarray(ap[1]), jnp.asarray(bp[0]), jnp.asarray(bp[1]))
    host = gl.mul(*ap, *bp)
    ok = (np.array_equal(np.asarray(dev[0]), host[0])
          and np.array_equal(np.asarray(dev[1]), host[1]))
    print(f"gl.mul device parity: {'OK' if ok else 'FAIL'}")
    assert ok

    # --- throughput (dependent-chain timing: defeats async caching) --------
    if on_tpu:
        lo = jnp.asarray(rng.integers(0, 1 << 31, (12, 1 << 17),
                                      dtype=np.uint64).astype(np.uint32))
        hi = jnp.zeros((12, 1 << 17), jnp.uint32)
        f = jax.jit(lambda lo, hi: permute_stacked_pallas(lo, hi))
        o = f(lo, hi)
        np.asarray(o[0])
        reps = 30
        t0 = time.time()
        for _ in range(reps):
            o = f(*o)
        np.asarray(o[0])
        dt = (time.time() - t0) / reps
        print(f"poseidon pallas [12, 2^17]: {dt*1e3:.2f} ms "
              f"-> {(1 << 17) / dt / 1e6:.1f} Mperm/s")


if __name__ == "__main__":
    main()
