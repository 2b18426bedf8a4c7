"""ops/dropout.py::fast_dropout — the 8-bit-mask dropout on the training path.

Pins the exactness contract the op documents: determinism, unbiasedness under
the quantized keep rate, the true-linearization backward, and that the model's
``fast_dropout`` flag changes only the RNG stream (same distributional
behavior, identical deterministic forward).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from transformergrooveinfilling_tpu.ops.dropout import (
    fast_dropout,
    quantized_keep_rate,
)


@pytest.fixture
def x(rng):
    return jnp.asarray(rng.standard_normal((64, 32, 48)), jnp.float32)


def test_deterministic_given_key(x):
    k = jax.random.PRNGKey(7)
    a = fast_dropout(x, k, 0.3)
    b = fast_dropout(x, k, 0.3)
    assert (np.asarray(a) == np.asarray(b)).all()
    c = fast_dropout(x, jax.random.PRNGKey(8), 0.3)
    assert (np.asarray(a) != np.asarray(c)).any()


@pytest.mark.parametrize("rate", [0.1, 0.3, 0.47, 0.75])
def test_keep_rate_matches_quantized(x, rate):
    y = fast_dropout(x, jax.random.PRNGKey(1), rate)
    kept = float((np.asarray(y) != 0).mean())
    expected = quantized_keep_rate(rate)
    # 64*32*48 ≈ 98k Bernoulli draws: 4 sigma ≈ 0.006
    assert abs(kept - expected) < 0.008


def test_unbiased_rescale(x):
    """Kept values are scaled by the *quantized* keep rate, so the conditional
    expectation is exact: out == x / keep_eff wherever the mask kept."""
    rate = 0.3
    y = np.asarray(fast_dropout(x, jax.random.PRNGKey(2), rate))
    keep_eff = quantized_keep_rate(rate)
    xs = np.asarray(x)
    kept = y != 0
    np.testing.assert_allclose(y[kept], xs[kept] / keep_eff, rtol=1e-6)


def test_backward_is_true_linearization(x):
    """grad is mask/keep_eff: zero exactly at dropped positions, 1/keep_eff at
    kept ones — the same mask the forward used."""
    k = jax.random.PRNGKey(3)
    rate = 0.4
    y = np.asarray(fast_dropout(x, k, rate))
    g = np.asarray(jax.grad(lambda v: fast_dropout(v, k, rate).sum())(x))
    keep_eff = quantized_keep_rate(rate)
    np.testing.assert_allclose(
        g, (y != 0).astype(np.float32) / keep_eff, rtol=1e-6)


def test_rate_zero_identity_and_validation(x):
    assert fast_dropout(x, jax.random.PRNGKey(0), 0.0) is x
    # rates below one quantization step also collapse to identity
    assert fast_dropout(x, jax.random.PRNGKey(0), 1e-4) is x
    with pytest.raises(ValueError):
        fast_dropout(x, jax.random.PRNGKey(0), 1.0)
    with pytest.raises(ValueError):
        fast_dropout(x, jax.random.PRNGKey(0), -0.1)


def test_vmap_gives_distinct_masks(x):
    """vmap over keys (the batched-sweep path, train/vmap_sweep.py) must give
    each lane its own mask."""
    keys = jax.random.split(jax.random.PRNGKey(4), 3)
    ys = jax.vmap(lambda k: fast_dropout(x, k, 0.3))(keys)
    assert (np.asarray(ys[0] != 0) != np.asarray(ys[1] != 0)).any()


def test_model_flag_only_changes_rng_stream(rng):
    """fast_dropout=True vs False: identical deterministic forward (no dropout
    applied), and training forwards agree in distribution (same keep stats)."""
    from transformergrooveinfilling_tpu.models import build_model
    from transformergrooveinfilling_tpu.models.transformer import (
        GrooveTransformerConfig,
    )

    x = jnp.asarray(rng.standard_normal((4, 32, 16)), jnp.float32)
    outs = {}
    for fast in (False, True):
        cfg = GrooveTransformerConfig(
            d_model=16, n_heads=2, dim_feedforward=16, dropout=0.3,
            num_encoder_layers=2, fast_dropout=fast)
        model = build_model(cfg)
        params = model.init(jax.random.PRNGKey(0), x)["params"]
        outs[fast] = model.apply({"params": params}, x, deterministic=True)
        # training-mode forward runs the dropout path without error
        h, v, o = model.apply(
            {"params": params}, x, deterministic=False,
            rngs={"dropout": jax.random.PRNGKey(1)})
        assert np.isfinite(np.asarray(h)).all()
    for a, b in zip(outs[False], outs[True]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
