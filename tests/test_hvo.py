"""HVO core: grid ops, sequence object, masking semantics."""

import jax
import jax.numpy as jnp
import numpy as np

from transformergrooveinfilling_tpu.hvo import (
    HVOSequence,
    N_VOICES,
    ROLAND_REDUCED_MAPPING,
    midi_note_to_voice,
    ops,
)


def make_seq(rng, t=32, density=0.3):
    h = (rng.random((t, N_VOICES)) < density).astype(float)
    v = rng.random((t, N_VOICES)) * h
    o = (rng.random((t, N_VOICES)) - 0.5) * h
    seq = HVOSequence(hvo=np.concatenate([h, v, o], axis=1))
    return seq


def test_mapping_shape():
    assert N_VOICES == 9
    assert list(ROLAND_REDUCED_MAPPING)[0] == "KICK"
    assert midi_note_to_voice(36) == 0
    assert midi_note_to_voice(38) == 1
    assert midi_note_to_voice(1) is None


def test_split_combine_roundtrip(rng):
    x = jnp.asarray(rng.random((4, 32, 27)))
    h, v, o = ops.split_hvo(x)
    assert h.shape == (4, 32, 9)
    np.testing.assert_allclose(ops.combine_hvo(h, v, o), x)


def test_reset_voices_partition(rng):
    seq = make_seq(rng)
    kept, removed = seq.reset_voices([0, 2])
    # partition: kept + removed == original
    np.testing.assert_allclose(kept.hvo + removed.hvo, seq.hvo)
    # removed contains only voices 0 and 2 (h, v, o triples)
    for voice in range(N_VOICES):
        cols = [voice, voice + N_VOICES, voice + 2 * N_VOICES]
        if voice in (0, 2):
            np.testing.assert_allclose(kept.hvo[:, cols], 0)
        else:
            np.testing.assert_allclose(removed.hvo[:, cols], 0)


def test_reset_voices_jax_matches_numpy(rng):
    seq = make_seq(rng)
    mask = ops.voice_mask_from_indices([1, 3])
    kept_j, removed_j = ops.reset_voices(jnp.asarray(seq.hvo), mask)
    kept_n, removed_n = seq.reset_voices([1, 3])
    np.testing.assert_allclose(np.asarray(kept_j), kept_n.hvo)
    np.testing.assert_allclose(np.asarray(removed_j), removed_n.hvo)


def test_remove_random_events_partition():
    key = jax.random.PRNGKey(0)
    rng = np.random.default_rng(1)
    seq = make_seq(rng, density=0.5)
    x = jnp.asarray(seq.hvo)
    kept, removed = ops.remove_random_events(x, key, (0.4, 0.6))
    np.testing.assert_allclose(np.asarray(kept + removed), seq.hvo, atol=1e-7)
    # removed events keep their velocity/offset with the hit
    h_r = np.asarray(removed[:, :N_VOICES])
    v_r = np.asarray(removed[:, N_VOICES : 2 * N_VOICES])
    assert ((v_r != 0) <= (h_r > 0)).all()
    # roughly 40-60% of events removed
    n_events = seq.hits.sum()
    frac = h_r.sum() / n_events
    assert 0.2 < frac < 0.8


def test_remove_random_events_host(rng):
    seq = make_seq(rng, density=0.5)
    kept, removed = seq.remove_random_events((0.4, 0.6), rng=np.random.default_rng(3))
    np.testing.assert_allclose(kept.hvo + removed.hvo, seq.hvo)
    assert not removed.is_silent()


def test_active_voices(rng):
    seq = make_seq(rng, density=0.0)
    seq.hvo[5, 2] = 1.0  # one HH_CLOSED hit
    assert list(seq.get_active_voices()) == [2]
    av = ops.get_active_voices(jnp.asarray(seq.hvo))
    assert np.asarray(av).tolist() == [False, False, True] + [False] * 6


def test_pad_to_length(rng):
    seq = make_seq(rng, t=17)
    seq.pad_to_length(32)
    assert seq.hvo.shape == (32, 27)
    np.testing.assert_allclose(seq.hvo[17:], 0)
    long = make_seq(rng, t=40)
    long.pad_to_length(32)
    assert long.hvo.shape == (32, 27)
    x = ops.pad_to_length(jnp.zeros((3, 17, 27)), 32)
    assert x.shape == (3, 32, 27)


def test_copy_empty_keeps_metadata(rng):
    seq = make_seq(rng)
    seq.metadata.style_primary = "funk"
    e = seq.copy_empty()
    assert e.metadata.style_primary == "funk"
    assert e.is_silent()
    assert not seq.is_silent()


def test_batched_ops_vmap(rng):
    x = jnp.asarray(rng.random((8, 32, 27)))
    keys = jax.random.split(jax.random.PRNGKey(0), 8)
    kept, removed = ops.remove_random_events_batch(x, keys, (0.4, 0.6))
    assert kept.shape == x.shape
    masks = jnp.tile(ops.voice_mask_from_indices([0])[None], (8, 1))
    kept2, removed2 = ops.reset_voices_batch(x, masks)
    np.testing.assert_allclose(np.asarray(kept2 + removed2), np.asarray(x))


def test_ops_arbitrary_lengths(rng):
    """Grid ops hold for non-default T (the reference hard-fixes T=32; ours
    parameterize it)."""
    for t in (8, 17, 64):
        x = jnp.asarray(rng.random((2, t, 27)))
        mask = ops.voice_mask_from_indices([0, 4])
        kept, removed = jax.vmap(ops.reset_voices, in_axes=(0, None))(x, mask)
        np.testing.assert_allclose(np.asarray(kept + removed), np.asarray(x))
        keys = jax.random.split(jax.random.PRNGKey(t), 2)
        k2, r2 = ops.remove_random_events_batch(x, keys, (0.4, 0.6))
        np.testing.assert_allclose(np.asarray(k2 + r2), np.asarray(x),
                                   atol=1e-7)
        assert ops.pad_to_length(x, 32).shape == (2, 32, 27)


def test_voice_mask_empty():
    mask = ops.voice_mask_from_indices([])
    assert not bool(mask.any())
    x = jnp.ones((32, 27))
    kept, removed = ops.reset_voices(x, mask)
    np.testing.assert_allclose(np.asarray(kept), np.asarray(x))
    np.testing.assert_allclose(np.asarray(removed), 0)


def test_deepcopy_is_fully_independent():
    """The structure-aware __deepcopy__ must keep full deep-copy semantics:
    no mutation of the copy may reach the original, including drum-mapping
    value lists and ad-hoc attributes."""
    import copy

    seq = HVOSequence()
    seq.hvo[0, 0] = 1.0
    seq.metadata.style_primary = "funk"
    seq.extra = {"nested": [1, 2]}  # ad-hoc attribute

    dup = copy.deepcopy(seq)
    dup.hvo[0, 0] = 9.0
    dup.metadata.style_primary = "rock"
    dup.tempos[0].qpm = 77.0
    dup.time_signatures[0].numerator = 7
    next(iter(dup.drum_mapping.values())).append(999)
    dup.extra["nested"].append(3)

    assert seq.hvo[0, 0] == 1.0
    assert seq.metadata.style_primary == "funk"
    assert seq.tempos[0].qpm == 120.0
    assert seq.time_signatures[0].numerator == 4
    assert 999 not in next(iter(seq.drum_mapping.values()))
    assert seq.extra == {"nested": [1, 2]}
    # .copy() rides the same path
    assert seq.copy().metadata.style_primary == "funk"
