"""JAX runtime configuration: persistent compilation cache.

The prover's jitted pipeline is a large XLA module (u32-pair Goldilocks
arithmetic expands every field op ~60x); first-compile cost is minutes-scale
on small hosts.  The persistent compilation cache makes every subsequent
process (tests, bench, driver compile checks) hit the disk cache instead.

Importing this module is idempotent and safe before or after the first jax
import, but must happen before the first jit compilation to take effect.
Disable with PLONKY2_TPU_NO_CACHE=1; override location with
JAX_COMPILATION_CACHE_DIR.
"""

from __future__ import annotations

import os

_DONE = False


def setup_cache():
    global _DONE
    if _DONE:
        return
    _DONE = True
    setup_cpu_fast_field()
    if os.environ.get("PLONKY2_TPU_NO_CACHE") == "1":
        return
    import jax

    path = os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "plonky2_ecdsa_tpu_jax"),
    )
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


def setup_cpu_fast_field():
    """On CPU backends, switch Goldilocks interior arithmetic to native u64
    (x64 mode): 3-6x fewer primitives per field op, which cuts both the
    prover's XLA compile time and its CPU runtime.  No-op on TPU (no 64-bit
    integer lanes there; the u32-pair path is the device representation)."""
    import os

    if os.environ.get("PLONKY2_TPU_FORCE_U32") == "1":
        return
    import jax

    if jax.default_backend() == "cpu":
        jax.config.update("jax_enable_x64", True)
        from .fields import goldilocks as gl

        gl.enable_jax_u64(True)
