"""Vectorized, jit-compatible HVO grid operations.

The reference implements these as per-object Python methods on ``HVO_Sequence``
(called from /root/reference/dataset.py:239,516 and utils.py:12-47). Here they are
pure functions over fixed-shape arrays so they ``vmap``/``jit`` cleanly: masking is
expressed as elementwise selects (no data-dependent shapes), and randomness flows
through explicit ``jax.random`` keys — the TPU-friendly replacements for the
reference's Python-loop + ``random`` module semantics (SURVEY.md §7.1 step 1).

All functions accept arrays shaped ``(..., T, 3*V)`` and broadcast over leading
batch dimensions.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .mapping import N_VOICES


def split_hvo(hvo: jax.Array, n_voices: int = N_VOICES):
    """Split ``(..., T, 3V)`` into hits/velocities/offsets ``(..., T, V)`` views."""
    h = hvo[..., :n_voices]
    v = hvo[..., n_voices : 2 * n_voices]
    o = hvo[..., 2 * n_voices :]
    return h, v, o


def combine_hvo(h: jax.Array, v: jax.Array, o: jax.Array) -> jax.Array:
    """Concatenate hits/velocities/offsets back into a ``(..., T, 3V)`` grid."""
    return jnp.concatenate([h, v, o], axis=-1)


def voice_mask_from_indices(voice_idx, n_voices: int = N_VOICES) -> jax.Array:
    """Boolean ``(V,)`` mask with True at the given voice indices (static arg).

    Indices are validated eagerly: JAX scatter silently *drops*
    out-of-bounds updates, so a config typo like ``voice_idx=[9]`` on the
    9-voice kit would otherwise yield an all-False mask and a model silently
    trained against empty targets."""
    idx = [int(v) for v in voice_idx]
    if any(not 0 <= v < n_voices for v in idx):
        raise ValueError(
            f"voice indices {idx} out of range for {n_voices} voices")
    mask = jnp.zeros((n_voices,), dtype=bool)
    if idx:
        mask = mask.at[jnp.asarray(idx)].set(True)
    return mask


def channel_mask(voice_mask: jax.Array) -> jax.Array:
    """Expand a ``(V,)`` voice mask to the ``(3V,)`` HVO channel layout.

    Channel layout per /root/reference/utils.py:38-47 (``get_hvo_idxs_for_voice``):
    hit channel = voice index, velocity = +V, offset = +2V.
    """
    return jnp.concatenate([voice_mask, voice_mask, voice_mask], axis=-1)


def reset_voices(hvo: jax.Array, voice_mask: jax.Array):
    """Split a groove into (input, target) by removing whole voices.

    Mirrors ``HVO_Sequence.reset_voices(voice_idx)`` (call site
    /root/reference/dataset.py:239): the *input* keeps every voice **not** in the
    mask (selected voices fully zeroed — hits, velocities, and offsets), and the
    *target* contains only the removed voices.

    Args:
        hvo: ``(..., T, 3V)`` grid.
        voice_mask: ``(V,)`` bool, True = remove this voice.

    Returns:
        ``(kept, removed)`` arrays of the same shape as ``hvo``.
    """
    cmask = channel_mask(voice_mask)
    removed = jnp.where(cmask, hvo, 0.0)
    kept = jnp.where(cmask, 0.0, hvo)
    return kept, removed


def remove_random_events(hvo: jax.Array, key: jax.Array, thres_range=(0.4, 0.6)):
    """Split a groove into (input, target) by removing a random subset of events.

    Mirrors ``HVO_Sequence.remove_random_events(thres_range)`` (call site
    /root/reference/dataset.py:516): a removal threshold is drawn uniformly from
    ``thres_range`` per call, then each *event* (an active hit cell) is removed
    independently with that probability. Removed events move — with their velocity
    and offset — to the target grid; everything else stays in the input grid.

    Args:
        hvo: ``(..., T, 3V)`` grid.
        key: PRNG key (one per sequence; ``vmap`` with split keys for batches).
        thres_range: (low, high) for the uniform removal-probability draw.

    Returns:
        ``(kept, removed)`` arrays of the same shape as ``hvo``.
    """
    n_voices = hvo.shape[-1] // 3
    h, v, o = split_hvo(hvo, n_voices)
    k_thres, k_events = jax.random.split(key)
    thres = jax.random.uniform(
        k_thres, (), minval=thres_range[0], maxval=thres_range[1]
    )
    u = jax.random.uniform(k_events, h.shape)
    remove = (u < thres) & (h > 0)
    remove3 = jnp.concatenate([remove, remove, remove], axis=-1)
    removed = jnp.where(remove3, hvo, 0.0)
    kept = jnp.where(remove3, 0.0, hvo)
    return kept, removed


def get_active_voices(hvo: jax.Array) -> jax.Array:
    """Boolean ``(..., V)`` mask of voices with at least one hit.

    Mirrors ``HVO_Sequence.get_active_voices()`` (/root/reference/utils.py:57).
    """
    n_voices = hvo.shape[-1] // 3
    h = hvo[..., :n_voices]
    return jnp.any(h > 0, axis=-2)


def pad_to_length(hvo: jax.Array, max_len: int) -> jax.Array:
    """Zero-pad (or truncate) the time axis to exactly ``max_len`` rows.

    Mirrors ``pad_to_match_max_seq_len`` (/root/reference/utils.py:12-17).
    Shapes are static, so this is trace-safe.
    """
    t = hvo.shape[-2]
    if t < max_len:
        pad = [(0, 0)] * (hvo.ndim - 2) + [(0, max_len - t), (0, 0)]
        hvo = jnp.pad(hvo, pad)
    return hvo[..., :max_len, :]


def is_silent(hvo: jax.Array) -> jax.Array:
    """True if the grid holds no information at all (reference's silent filter,
    /root/reference/dataset.py:207)."""
    return ~jnp.any(hvo != 0, axis=(-2, -1))


# Batched variants (explicit vmaps so callers don't rebuild them per step).

reset_voices_batch = jax.vmap(reset_voices, in_axes=(0, 0))
remove_random_events_batch = jax.vmap(
    remove_random_events, in_axes=(0, 0, None), out_axes=0
)
