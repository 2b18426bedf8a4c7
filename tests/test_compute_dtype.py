"""compute_dtype plumbing: bf16 configs must lower true bf16 matmuls.

Round-2 perf find (docs/PERF.md "promotion trap"): flax ``Dense`` holds f32
params, so casting activations to bf16 alone lets jnp promotion silently turn
every dot back into f32 (3-pass MXU, +15 % whole-step cost). The model passes
``dtype=compute_dtype`` to every Dense; these tests pin that contract by
inspecting the traced jaxpr.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from transformergrooveinfilling_tpu.models import build_model
from transformergrooveinfilling_tpu.models.transformer import (
    GrooveTransformerConfig,
)


def _dot_dtypes(cfg, encoder_only=True):
    model = build_model(cfg)
    x = jnp.zeros((2, 32, cfg.embedding_size_src))
    args = (x,) if encoder_only else (x, jnp.zeros((2, 32, 27)))
    params = model.init(jax.random.PRNGKey(0), *args)["params"]
    jaxpr = jax.make_jaxpr(
        lambda p, *a: model.apply({"params": p}, *a, deterministic=True)
    )(params, *args)
    return [str(e.outvars[0].aval.dtype) for e in jaxpr.jaxpr.eqns
            if "dot" in str(e.primitive)]


@pytest.mark.parametrize("encoder_only", [True, False])
def test_bf16_config_lowers_bf16_dots(encoder_only):
    cfg = GrooveTransformerConfig(
        d_model=32, n_heads=2, dim_feedforward=16, num_encoder_layers=1,
        num_decoder_layers=0 if encoder_only else 1,
        compute_dtype=jnp.bfloat16)
    dts = _dot_dtypes(cfg, encoder_only)
    # every dot except the f32 output head runs in bf16
    assert dts.count("float32") == 1, dts
    assert set(dts) == {"bfloat16", "float32"}, dts


def test_f32_config_unchanged():
    cfg = GrooveTransformerConfig(
        d_model=32, n_heads=2, dim_feedforward=16, num_encoder_layers=1)
    assert set(_dot_dtypes(cfg)) == {"float32"}


def test_bf16_forward_close_to_f32(rng):
    """Same params, both dot dtypes: outputs agree to bf16 tolerance."""
    cfg32 = GrooveTransformerConfig(
        d_model=32, n_heads=2, dim_feedforward=16, num_encoder_layers=2)
    cfg16 = GrooveTransformerConfig(
        d_model=32, n_heads=2, dim_feedforward=16, num_encoder_layers=2,
        compute_dtype=jnp.bfloat16)
    m32, m16 = build_model(cfg32), build_model(cfg16)
    x = jnp.asarray(rng.standard_normal((4, 32, 16)), jnp.float32)
    params = m32.init(jax.random.PRNGKey(0), x)["params"]
    a = m32.apply({"params": params}, x, deterministic=True)
    b = m16.apply({"params": params}, x, deterministic=True)
    for pa, pb in zip(a, b):
        np.testing.assert_allclose(np.asarray(pa), np.asarray(pb),
                                   atol=0.06, rtol=0.05)
