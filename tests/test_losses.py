"""Loss parity: JAX calculate_loss vs torch oracle (BCEWithLogits + MSE,
penalty-masked, sum-over-voices → mean)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from transformergrooveinfilling_tpu.models.losses import calculate_loss
from oracle import torch_calculate_loss


def _fake_batch(rng, b=6, t=32, v=9):
    h_logits = rng.standard_normal((b, t, v)).astype(np.float32)
    vel = rng.random((b, t, v)).astype(np.float32)
    off = (rng.random((b, t, v)).astype(np.float32) - 0.5)
    y_h = (rng.random((b, t, v)) < 0.3).astype(np.float32)
    y = np.concatenate([y_h, rng.random((b, t, v)) * y_h,
                        (rng.random((b, t, v)) - 0.5) * y_h], axis=2).astype(np.float32)
    return (h_logits, vel, off), y


@pytest.mark.parametrize("penalty", [1.0, 0.47, 0.0])
def test_loss_matches_torch(rng, penalty):
    pred, y = _fake_batch(rng)
    out = calculate_loss(tuple(jnp.asarray(p) for p in pred), jnp.asarray(y), penalty)
    t_total, t_bce, t_mse_v, t_mse_o = torch_calculate_loss(
        tuple(torch.from_numpy(p) for p in pred), torch.from_numpy(y), penalty
    )
    np.testing.assert_allclose(float(out.total_loss), float(t_total), rtol=1e-5)
    np.testing.assert_allclose(float(out.bce_hits), float(t_bce), rtol=1e-5)
    np.testing.assert_allclose(float(out.mse_velocities), float(t_mse_v), rtol=1e-5)
    np.testing.assert_allclose(float(out.mse_offsets), float(t_mse_o), rtol=1e-5)


def test_loss_diagnostics(rng):
    pred, y = _fake_batch(rng)
    out = calculate_loss(tuple(jnp.asarray(p) for p in pred), jnp.asarray(y), 0.5)
    assert 0.0 <= float(out.hit_accuracy) <= 1.0
    np.testing.assert_allclose(float(out.hit_perplexity),
                               np.exp(float(out.bce_hits)), rtol=1e-5)


def test_perfect_prediction_low_loss(rng):
    _, y = _fake_batch(rng)
    v = y.shape[2] // 3
    pred = (
        jnp.asarray(np.where(y[..., :v] == 1, 20.0, -20.0).astype(np.float32)),
        jnp.asarray(y[..., v : 2 * v]),
        jnp.asarray(y[..., 2 * v :]),
    )
    out = calculate_loss(pred, jnp.asarray(y), 1.0)
    assert float(out.total_loss) < 1e-3
    assert float(out.hit_accuracy) == 1.0
