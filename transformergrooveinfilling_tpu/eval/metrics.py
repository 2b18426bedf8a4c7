"""Scalar evaluation metrics, vectorized.

The reference's per-epoch scalars (/root/reference/evaluator.py:522-525):
``get_hits_accuracies`` / ``get_velocity_errors`` / ``get_micro_timing_errors``
over the 9-voice drum mapping, computed per voice across the full prediction/GT
stacks and merged into one wandb log dict. The per-voice math here is one
vectorized pass over the stacked ``(N, T, 3V)`` arrays. Key naming
``{set}_{Metric}_{voice}`` [re-derived — the absent GrooveEvaluator submodule
pins only the call signature].

Placement rule (measured, round 3): these are ~10 ms reductions over a few MB.
When the stacks already live on an accelerator, a jitted kernel computes them
in place and ONE ``device_get`` fetches all three families together. When the
stacks are host numpy (the evaluator path: predictions come back from
``model.predict`` as host arrays), the reduction runs in numpy — shipping
3.5 MB to a *tunneled* TPU and fetching three result arrays back costs three
device round-trips per eval epoch, and the first fetch after compile stalled
~100 s on the dev tunnel (profiled in docs/PERF.md, round 3).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..hvo.mapping import VOICE_NAMES


@jax.jit
def _metric_stack_jit(pred: jax.Array, gt: jax.Array):
    """(hits accuracy, velocity MSE, offset MSE) per voice, each ``(V,)``."""
    n = gt.shape[-1] // 3
    p_h, g_h = pred[..., :n], gt[..., :n]
    p_v, g_v = pred[..., n : 2 * n], gt[..., n : 2 * n]
    p_o, g_o = pred[..., 2 * n :], gt[..., 2 * n :]
    acc = jnp.mean((p_h == g_h).astype(jnp.float32), axis=(0, 1))
    mse_v = jnp.mean(jnp.square(p_v - g_v), axis=(0, 1))
    mse_o = jnp.mean(jnp.square(p_o - g_o), axis=(0, 1))
    return acc, mse_v, mse_o


def _metric_stack_np(pred: np.ndarray, gt: np.ndarray):
    """Numpy twin of ``_metric_stack_jit`` (same math, same dtypes)."""
    pred = np.asarray(pred)
    gt = np.asarray(gt)
    n = gt.shape[-1] // 3
    acc = np.mean((pred[..., :n] == gt[..., :n]).astype(np.float32),
                  axis=(0, 1))
    mse_v = np.mean(np.square(pred[..., n:2 * n] - gt[..., n:2 * n]),
                    axis=(0, 1))
    mse_o = np.mean(np.square(pred[..., 2 * n:] - gt[..., 2 * n:]),
                    axis=(0, 1))
    return acc, mse_v, mse_o


def _metric_stack(pred, gt):
    """Route by residency: device stacks reduce in place (one fetch for all
    three outputs); host stacks never touch the device (see module docstring).
    Returns three host numpy ``(V,)`` arrays either way."""
    if isinstance(pred, jax.Array) or isinstance(gt, jax.Array):
        return jax.device_get(
            _metric_stack_jit(jnp.asarray(pred), jnp.asarray(gt)))
    return _metric_stack_np(pred, gt)


def hits_accuracy_per_voice(pred, gt) -> np.ndarray:
    return np.asarray(_metric_stack(pred, gt)[0])


def velocity_mse_per_voice(pred, gt) -> np.ndarray:
    return np.asarray(_metric_stack(pred, gt)[1])


def offset_mse_per_voice(pred, gt) -> np.ndarray:
    return np.asarray(_metric_stack(pred, gt)[2])


def format_families(identifier: str, acc, mse_v, mse_o,
                    voice_names=None) -> dict:
    """Per-voice metric stacks → the reference's flat ``{key: float}`` naming
    (``{set}_{Family}_{voice}`` + ``_mean``). Shared by the host path
    (:func:`metrics_dict`) and the driver's on-device fast path, so both log
    byte-identical key sets."""
    voice_names = list(voice_names) if voice_names else list(VOICE_NAMES)
    out = {}
    for fam, arr in (("Hits_Accuracy", np.asarray(acc)),
                     ("Velocity_MSE", np.asarray(mse_v)),
                     ("Micro_Timing_MSE", np.asarray(mse_o))):
        for name, val in zip(voice_names, arr):
            out[f"{identifier}_{fam}_{name}"] = float(val)
        out[f"{identifier}_{fam}_mean"] = float(arr.mean())
    return out


def metrics_dict(pred, gt, identifier: str, drum_mapping=None) -> dict:
    """All three metric families as one flat ``{key: float}`` dict (what the
    reference merges into a single wandb.log call)."""
    acc, mse_v, mse_o = _metric_stack(pred, gt)
    return format_families(identifier, acc, mse_v, mse_o,
                           voice_names=drum_mapping)


def rhythmic_distances(pred, gt, identifier: str = "") -> dict:
    """Prediction↔GT rhythmic distance summary (the reference's optional
    ``get_rhythmic_distances``, evaluator.py:604): per-pair hamming distance on
    hits, L2 on velocities, L2 on offsets — mean and std across the set."""
    pred = np.asarray(pred)
    gt = np.asarray(gt)
    n = gt.shape[-1] // 3
    hamming = np.abs((pred[..., :n] > 0.5) ^ (gt[..., :n] > 0.5)).sum(axis=(1, 2))
    vel_l2 = np.sqrt(
        np.square(pred[..., n:2 * n] - gt[..., n:2 * n]).sum(axis=(1, 2)))
    off_l2 = np.sqrt(np.square(pred[..., 2 * n:] - gt[..., 2 * n:]).sum(axis=(1, 2)))
    prefix = f"{identifier}_" if identifier else ""
    return {
        f"{prefix}Rhythmic_Distance_Hamming_mean": float(hamming.mean()),
        f"{prefix}Rhythmic_Distance_Hamming_std": float(hamming.std()),
        f"{prefix}Rhythmic_Distance_Velocity_L2_mean": float(vel_l2.mean()),
        f"{prefix}Rhythmic_Distance_Velocity_L2_std": float(vel_l2.std()),
        f"{prefix}Rhythmic_Distance_Offset_L2_mean": float(off_l2.mean()),
        f"{prefix}Rhythmic_Distance_Offset_L2_std": float(off_l2.std()),
    }
