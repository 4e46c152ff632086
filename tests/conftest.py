"""Test harness config: CPU backend with 8 virtual devices for mesh tests.

Must set XLA flags before jax initializes (SURVEY.md §4 TPU-build implication d).
"""

import os

# Force CPU: the ambient env may point JAX at a single real TPU chip
# (JAX_PLATFORMS=axon); unit tests need the deterministic 8-virtual-device
# CPU backend. Device runs go through bench.py / scripts instead.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

# Some device plugins (axon) override JAX_PLATFORMS at registration; the
# config flag takes final precedence.
import jax

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the prover's XLA modules are minutes-scale
# first compiles on small CI hosts; cache them across test processes.
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from plonky2_ecdsa_tpu.jaxcfg import setup_cache

setup_cache()

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0xECD5A)
