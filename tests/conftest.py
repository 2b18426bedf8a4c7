"""Test harness config.

Tests run on CPU with 8 virtual XLA host devices so multi-chip sharding paths are
exercised without TPU hardware (SURVEY.md §4: the fake-backend substitute for a
real pod). Must run before anything imports jax.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

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
