"""Test harness config.

Tests run on CPU with 8 virtual XLA host devices so multi-chip sharding paths are
exercised without TPU hardware (SURVEY.md §4: the fake-backend substitute for a
real pod). Must run before anything imports jax.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
# persistent compile cache: repeated test runs skip XLA recompilation
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tgi")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.1")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# The axon sitecustomize force-selects the tunneled TPU backend ("axon,cpu")
# regardless of JAX_PLATFORMS; on this 1-CPU host every eager op then pays a
# ~1 s network round-trip. Override before any backend initialization.
jax.config.update("jax_platforms", "cpu")

import pathlib
import sys

# repo root on sys.path so `import transformergrooveinfilling_tpu` works from tests/
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)


DEMO_CHECKPOINT = "/root/reference/demo/transformer_run_171tyqit_Epoch_1.Model"


@pytest.fixture(scope="session")
def demo_checkpoint_path():
    if not os.path.exists(DEMO_CHECKPOINT):
        pytest.skip("reference demo checkpoint not available")
    return DEMO_CHECKPOINT
