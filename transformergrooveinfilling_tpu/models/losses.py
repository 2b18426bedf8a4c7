"""Three-headed infilling loss.

Re-derivation of ``BaseGrooveTransformers.calculate_loss`` from its call contract
(/root/reference/train.py:176-213): BCE-with-logits on hits plus MSE on velocity
and offset heads, each elementwise loss scaled by a *hit-loss-penalty* matrix that
is 1 at ground-truth hit cells and ``hit_loss_penalty`` (∈ [0,1], train.py:55-59)
elsewhere — down-weighting the overwhelmingly-silent cells. Per-term reduction is
sum over the voice axis, then mean over batch×time [inferred from the public
BaseGrooveTransformers loss; validated against a torch re-implementation in
tests/test_losses.py]. Also returns the hit accuracy / perplexity diagnostics the
reference logs per step.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class LossOutputs(NamedTuple):
    total_loss: jax.Array
    hit_accuracy: jax.Array
    hit_perplexity: jax.Array
    bce_hits: jax.Array
    mse_velocities: jax.Array
    mse_offsets: jax.Array


def _bce_with_logits(logits, labels):
    """Numerically-stable elementwise binary cross entropy on logits
    (same formulation as torch ``BCEWithLogitsLoss(reduction="none")``)."""
    return jnp.maximum(logits, 0) - logits * labels + jnp.log1p(jnp.exp(-jnp.abs(logits)))


def calculate_loss(
    prediction,
    target,
    hit_loss_penalty: float | jax.Array,
    sample_weights: jax.Array | None = None,
) -> LossOutputs:
    """Compute the infilling training loss.

    Args:
        prediction: ``(h_logits, v, o)`` tuple from the model, each ``(B, T, V)``.
        target: ground-truth HVO grid ``(B, T, 3V)``.
        hit_loss_penalty: scalar multiplier applied to loss terms at non-hit cells.
        sample_weights: optional ``(B,)`` 0/1 weights; padded rows of a
            non-divisible final batch get weight 0 and drop out of every mean,
            so values match the reference's un-padded partial batches exactly.

    Returns:
        :class:`LossOutputs` with the total loss and per-head diagnostics.
    """
    pred_h, pred_v, pred_o = prediction
    n = target.shape[-1] // 3
    y_h = target[..., :n]
    y_v = target[..., n : 2 * n]
    y_o = target[..., 2 * n :]

    penalty = jnp.where(y_h == 1, 1.0, hit_loss_penalty).astype(jnp.float32)
    if sample_weights is None:
        w_rows = jnp.ones(target.shape[:-2] + (target.shape[-2],), jnp.float32)
    else:
        w_rows = jnp.broadcast_to(
            sample_weights.astype(jnp.float32)[..., None],
            target.shape[:-2] + (target.shape[-2],),
        )
    denom = jnp.maximum(jnp.sum(w_rows), 1.0)  # number of live (b, t) rows
    penalty = penalty * w_rows[..., None]

    def row_mean(cellwise):  # sum over voices, weighted mean over (B, T)
        return jnp.sum(cellwise) / denom

    bce_hits = row_mean(_bce_with_logits(pred_h.astype(jnp.float32), y_h) * penalty)
    mse_velocities = row_mean(jnp.square(pred_v.astype(jnp.float32) - y_v) * penalty)
    mse_offsets = row_mean(jnp.square(pred_o.astype(jnp.float32) - y_o) * penalty)

    total_loss = bce_hits + mse_velocities + mse_offsets

    h_pred = (jax.nn.sigmoid(pred_h) > 0.5).astype(jnp.float32)
    correct = (h_pred == y_h).astype(jnp.float32) * w_rows[..., None]
    hit_accuracy = jnp.sum(correct) / (denom * n)
    hit_perplexity = jnp.exp(bce_hits)

    return LossOutputs(
        total_loss=total_loss,
        hit_accuracy=hit_accuracy,
        hit_perplexity=hit_perplexity,
        bce_hits=bce_hits,
        mse_velocities=mse_velocities,
        mse_offsets=mse_offsets,
    )
