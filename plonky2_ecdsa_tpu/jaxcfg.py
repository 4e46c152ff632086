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
    if _DONE or os.environ.get("PLONKY2_TPU_NO_CACHE") == "1":
        return
    _DONE = True
    import jax

    path = os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "plonky2_ecdsa_tpu_jax"),
    )
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
