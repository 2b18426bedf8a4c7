"""Edge cases: empty/silent corpora, single items, serving validation,
sequence-level audio methods, audio-modality evaluator."""

import os

import numpy as np
import pytest

from transformergrooveinfilling_tpu.data import (
    GrooveMidiDatasetInfilling,
    GrooveMidiDatasetInfillingRandom,
    GrooveMidiDatasetInfillingSymbolic,
    synthetic_gmd_sequences,
)
from transformergrooveinfilling_tpu.hvo import HVOSequence, N_VOICES

_VP = {"voice_idx": [2], "min_n_voices_to_remove": 1,
       "max_n_voices_to_remove": 1, "prob": [1], "k": 2}


def test_empty_corpus_dataset():
    ds = GrooveMidiDatasetInfillingSymbolic(
        data=[], dataset_name="E", split="t", save=False, voices_params=_VP)
    assert len(ds) == 0
    assert ds.processed_inputs.shape == (0, 32, 27)


def test_all_silent_corpus_filtered():
    silent = [HVOSequence() for _ in range(3)]
    ds = GrooveMidiDatasetInfillingSymbolic(
        data=silent, dataset_name="S", split="t", save=False, voices_params=_VP)
    assert len(ds) == 0
    assert ds.hvo_sequences == []


def test_item_without_target_voice_marked_unused():
    seqs = synthetic_gmd_sequences(2, seed=2)
    # remove all HH_CLOSED hits from item 0 → no voice-2 to remove → unused
    seqs[0].hvo[:, 2] = 0
    seqs[0].hvo[:, 2 + N_VOICES] = 0
    seqs[0].hvo[:, 2 + 2 * N_VOICES] = 0
    seqs[0].hvo[0, 0] = 1  # keep it non-silent
    ds = GrooveMidiDatasetInfillingSymbolic(
        data=seqs, dataset_name="U", split="t", save=False, voices_params=_VP)
    assert 0 in ds.unused_items
    assert all(i == 1 for i in ds.hvo_index)


def test_random_dataset_single_item():
    seqs = synthetic_gmd_sequences(1, seed=3)
    ds = GrooveMidiDatasetInfillingRandom(
        data=seqs, dataset_name="R1", split="t", save=False,
        max_aug_items=3, seed=4)
    assert 0 < len(ds) <= 3
    x, y, _ = ds[0]
    assert x.shape == (32, 16)


def test_serve_rejects_wrong_shape(rng):
    import jax
    import jax.numpy as jnp

    from transformergrooveinfilling_tpu.models import build_model
    from transformergrooveinfilling_tpu.models.transformer import (
        GrooveTransformerConfig)
    from transformergrooveinfilling_tpu.serve import InfillServer

    cfg = GrooveTransformerConfig(d_model=16, n_heads=2, dim_feedforward=16,
                                  num_encoder_layers=1, embedding_size_src=16)
    m = build_model(cfg)
    p = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 16)),
               deterministic=True)["params"]
    srv = InfillServer(p, cfg, batch_sizes=(1,), use_pallas=False)
    with pytest.raises(ValueError, match="T=32"):
        srv.infill(np.zeros((4, 4), np.float32))
    with pytest.raises(ValueError):
        srv.infill(np.zeros((2, 32, 27), np.float32))  # wrong feature width


def test_sequence_save_audio_and_mso(tmp_path):
    seq = synthetic_gmd_sequences(1, seed=8)[0]
    path = str(tmp_path / "loop.wav")
    y = seq.save_audio(path)
    assert os.path.exists(path) and len(y) > 1000
    mso = seq.mso()
    assert mso.shape == (32, 16)
    assert mso.max() > 0


def test_audio_evaluator_sf_dict(tmp_path):
    """Evaluator over the audio dataset routes per-item soundfonts."""
    from transformergrooveinfilling_tpu.eval.evaluator import InfillingEvaluator

    seqs = synthetic_gmd_sequences(12, seed=17)
    ds = GrooveMidiDatasetInfilling(
        data=seqs, dataset_name="AE", split="t", save=False,
        voices_params={"voice_idx": [0, 1], "min_n_voices_to_remove": 1,
                       "max_n_voices_to_remove": 2, "prob": [1, 1], "k": 2},
        max_aug_items=2, seed=6)
    ev = InfillingEvaluator(
        _identifier="T", n_samples_to_use=12,
        n_samples_to_synthesize_visualize_per_subset=1,
        dataset=ds, sequences=seqs, horizontal=True)

    class Zero:
        def predict(self, inputs, use_thres=True, thres=0.5):
            n = inputs.shape[0]
            return [np.zeros((n, 32, 9), np.float32)] * 3

    ev.set_pred(Zero())
    assert hasattr(ev, "soundfonts")
    # sampled locations carry a soundfont entry (None = procedural kit)
    assert any(len(v) > 0 for v in ev.sf_dict.values())
    acc = ev.get_hits_accuracies()
    assert 0 <= acc["T_Hits_Accuracy_mean"] <= 1
