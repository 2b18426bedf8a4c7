"""Data layer: samplers, subsetter, symbolic + random datasets, pickle roundtrip."""

import random

import numpy as np
import pytest

from transformergrooveinfilling_tpu.data import (
    GrooveMidiDatasetInfillingRandom,
    GrooveMidiDatasetInfillingSymbolic,
    GrooveMidiSubsetter,
    get_sf_v_combinations,
    get_voice_combinations,
    get_voice_idx_for_item,
    load_processed_dataset,
    synthetic_gmd_sequences,
)
from transformergrooveinfilling_tpu.hvo import N_VOICES


def test_voice_combinations_all():
    combos = get_voice_combinations(
        voice_idx=[0, 1, 2], min_n_voices_to_remove=1, max_n_voices_to_remove=2,
        prob=[1, 1], k=None)
    assert set(combos) == {(0,), (1,), (2,), (0, 1), (0, 2), (1, 2)}


def test_voice_combinations_sampled_weighted():
    rng = random.Random(0)
    combos = get_voice_combinations(
        voice_idx=[0, 1], min_n_voices_to_remove=1, max_n_voices_to_remove=2,
        prob=[0, 1], k=50, rng=rng)
    # prob 0 for size-1 combos → only the size-2 combination appears
    assert set(combos) == {(0, 1)}
    assert len(combos) == 50


def test_voice_combinations_caps_max_size():
    combos = get_voice_combinations(
        voice_idx=[0, 1], min_n_voices_to_remove=1, max_n_voices_to_remove=5,
        prob=[1, 1], k=None)
    assert max(len(c) for c in combos) == 2


def test_voice_idx_for_item(rng):
    seqs = synthetic_gmd_sequences(1, seed=3)
    seq = seqs[0]
    seq.hvo[:, :N_VOICES] = 0
    seq.hvo[0, 0] = 1  # only KICK active
    params = {"voice_idx": [0, 1], "min_n_voices_to_remove": 1,
              "max_n_voices_to_remove": 2, "prob": [1, 1], "k": 5}
    voice_idx, new_params = get_voice_idx_for_item(seq, params)
    assert voice_idx == [0]
    assert new_params["voice_idx"] == [0]
    assert new_params["prob"] == [1]


def test_sf_v_combinations_cap():
    rng = random.Random(0)
    params = {"voice_idx": [0, 1], "min_n_voices_to_remove": 1,
              "max_n_voices_to_remove": 2, "prob": [1, 1], "k": 5}
    combos = get_sf_v_combinations(params, max_aug_items=3, max_n_sf=2,
                                   sfs_list=["a.sf2", "b.sf2", "c.sf2"], rng=rng)
    assert len(combos) <= 3
    for sf, v in combos:
        assert sf in ("a.sf2", "b.sf2", "c.sf2")
        assert isinstance(v, tuple)


def test_subsetter_filters():
    seqs = synthetic_gmd_sequences(44, seed=1)
    sub = GrooveMidiSubsetter(
        sequences=seqs,
        list_of_filter_dicts_for_subsets=[
            {"style_primary": ["funk"], "beat_type": ["beat"],
             "time_signature": ["4-4"]},
            {"style_primary": ["rock"]},
        ],
    )
    tags, subsets = sub.create_subsets()
    assert tags == ["funk", "rock"]
    assert all(s.metadata.style_primary == "funk" for s in subsets[0])
    assert all(s.metadata.style_primary == "rock" for s in subsets[1])
    assert len(subsets[0]) > 0 and len(subsets[1]) > 0


@pytest.fixture
def symbolic_dataset(tmp_path):
    seqs = synthetic_gmd_sequences(20, seed=7)
    return GrooveMidiDatasetInfillingSymbolic(
        data=seqs,
        dataset_name="TestSymbolic",
        split="train",
        save_dataset_path=str(tmp_path / "ds"),
        voices_params={"voice_idx": [2], "min_n_voices_to_remove": 1,
                       "max_n_voices_to_remove": 1, "prob": [1], "k": 5},
        max_aug_items=2,
        seed=11,
    )


def test_symbolic_dataset_shapes(symbolic_dataset):
    ds = symbolic_dataset
    assert len(ds) > 0
    x, y, idx = ds[0]
    assert x.shape == (32, 27) and y.shape == (32, 27)
    # input has HH_CLOSED (voice 2) zeroed; target only voice 2
    assert np.allclose(x[:, [2, 2 + 9, 2 + 18]], 0)
    mask = np.ones(27, bool)
    mask[[2, 11, 20]] = False
    assert np.allclose(y[:, mask], 0)
    # partition: input + target == original
    orig = ds.hvo_sequences[ds.hvo_index[0]].hvo
    np.testing.assert_allclose(x + y, orig.astype(np.float32), atol=1e-6)


def test_symbolic_dataset_pickle_roundtrip(symbolic_dataset):
    ds = symbolic_dataset
    loaded = load_processed_dataset(ds.save_dataset_path,
                                    exp="InfillingClosedHH_Symbolic")
    assert len(loaded) == len(ds)
    np.testing.assert_allclose(loaded.processed_inputs, ds.processed_inputs)
    np.testing.assert_allclose(loaded.processed_outputs, ds.processed_outputs)
    assert loaded.hvo_index == ds.hvo_index
    assert loaded.max_seq_len == ds.max_seq_len


def test_symbolic_dataset_deterministic(tmp_path):
    seqs = synthetic_gmd_sequences(10, seed=5)
    kw = dict(
        dataset_name="Det", split="t",
        voices_params={"voice_idx": [0, 1], "min_n_voices_to_remove": 1,
                       "max_n_voices_to_remove": 2, "prob": [1, 1], "k": 3},
        max_aug_items=4, seed=42, save=False,
    )
    a = GrooveMidiDatasetInfillingSymbolic(data=[s.copy() for s in seqs], **kw)
    b = GrooveMidiDatasetInfillingSymbolic(data=[s.copy() for s in seqs], **kw)
    np.testing.assert_allclose(a.processed_inputs, b.processed_inputs)
    assert a.voices_reduced == b.voices_reduced


def test_audio_dataset_mso_inputs(tmp_path):
    """GrooveMidiDatasetInfilling (audio modality): MSO inputs (32, 16)."""
    from transformergrooveinfilling_tpu.data import GrooveMidiDatasetInfilling

    seqs = synthetic_gmd_sequences(6, seed=21)
    ds = GrooveMidiDatasetInfilling(
        data=seqs, dataset_name="AudioDS", split="train",
        save_dataset_path=str(tmp_path / "ds"),
        voices_params={"voice_idx": [0, 1], "min_n_voices_to_remove": 1,
                       "max_n_voices_to_remove": 2, "prob": [1, 1], "k": 2},
        max_aug_items=2, seed=5, save=False)
    assert len(ds) > 0
    x, y, _ = ds[0]
    assert x.shape == (32, 16) and y.shape == (32, 27)
    assert np.isfinite(x).all() and (x >= 0).all()
    assert x.max() > 0  # non-silent input produced onset energy
    assert len(ds.soundfonts) == len(ds)


def test_train_loop_compat_wrapper(tmp_path):
    """Reference train_loop(...) signature drives one epoch."""
    from transformergrooveinfilling_tpu.data import (
        GrooveMidiDatasetInfillingSymbolic)
    from transformergrooveinfilling_tpu.train import initialize_model, train_loop

    seqs = synthetic_gmd_sequences(12, seed=31)
    ds = GrooveMidiDatasetInfillingSymbolic(
        data=seqs, dataset_name="TL", split="t",
        save_dataset_path=str(tmp_path), save=False,
        voices_params={"voice_idx": [2], "min_n_voices_to_remove": 1,
                       "max_n_voices_to_remove": 1, "prob": [1], "k": 2},
        max_aug_items=1, seed=2)
    params = {
        "model": {"experiment": "InfillingClosedHH_Symbolic", "encoder_only": 1,
                  "optimizer": "sgd", "d_model": 16, "n_heads": 2,
                  "dim_feedforward": 16, "dropout": 0.1,
                  "num_encoder_layers": 1, "num_decoder_layers": 0,
                  "max_len": 32, "embedding_size_src": 27,
                  "embedding_size_tgt": 27},
        "training": {"learning_rate": 0.05, "batch_size": 8,
                     "hit_loss_penalty": 0.5},
        "load_model": None}
    bundle, opt, ep0 = initialize_model(params)
    metrics = train_loop(
        dataloader=ds, groove_transformer=bundle, encoder_only=1, opt=opt,
        epoch=0, loss_fn=None, bce_fn=None, mse_fn=None, device=None,
        test_inputs=ds.processed_inputs, test_gt=ds.processed_outputs,
        validation_inputs=None, validation_gt=None,
        hit_loss_penalty=0.5, save=True, batch_size=8,
        ckpt_dir=str(tmp_path / "ck"))
    assert "loss" in metrics and "test_loss" in metrics
    assert "grad_norm" in metrics and metrics["grad_norm"] > 0
    import os
    assert any(f.endswith(".ckpt") for f in os.listdir(tmp_path / "ck"))


def test_streaming_augmenter_symbolic():
    from transformergrooveinfilling_tpu.data.pipeline import StreamingAugmenter

    seqs = synthetic_gmd_sequences(8, seed=41)
    base = np.stack([s.hvo for s in seqs]).astype(np.float32)
    with StreamingAugmenter(base, aug_per_item=3, mode="symbolic",
                            seed=9) as streamer:
        x1, y1 = streamer.next_epoch()
        x2, y2 = streamer.next_epoch()
    assert x1.shape == (24, 32, 27) and y1.shape == (24, 32, 27)
    # partition holds per generation
    np.testing.assert_allclose(
        x1 + y1, np.repeat(base, 3, axis=0), atol=1e-6)
    # generations differ (fresh random maskings)
    assert not np.allclose(x1, x2)
    # deterministic given the seed
    with StreamingAugmenter(base, aug_per_item=3, mode="symbolic",
                            seed=9) as s2:
        x1b, _ = s2.next_epoch()
    np.testing.assert_allclose(x1, x1b)


def test_streaming_augmenter_audio():
    from transformergrooveinfilling_tpu.data.pipeline import StreamingAugmenter

    seqs = synthetic_gmd_sequences(3, seed=43)
    base = np.stack([s.hvo for s in seqs]).astype(np.float32)
    qpms = [s.tempos[0].qpm for s in seqs]
    with StreamingAugmenter(base, qpms=qpms, aug_per_item=2,
                            mode="audio", seed=3) as streamer:
        x, y = streamer.next_epoch()
    assert x.shape == (6, 32, 16)
    assert (x >= 0).all() and x.max() > 0


def test_rhythmic_distances():
    from transformergrooveinfilling_tpu.eval.metrics import rhythmic_distances

    rng = np.random.default_rng(0)
    gt = (rng.random((5, 32, 27)) > 0.7).astype(np.float32)
    d0 = rhythmic_distances(gt, gt, "X")
    assert d0["X_Rhythmic_Distance_Hamming_mean"] == 0.0
    pred = gt.copy()
    pred[:, 0, 0] = 1 - pred[:, 0, 0]  # flip one hit per item
    d1 = rhythmic_distances(pred, gt, "X")
    assert d1["X_Rhythmic_Distance_Hamming_mean"] == 1.0


def test_get_hvo_sequence_with_filtered_items(tmp_path):
    """A silent corpus item is filtered out of hvo_sequences; get_hvo_sequence
    must still map every processed item to its true base sequence (the
    reference indexes the filtered list with the unfiltered corpus index,
    dataset.py:352-356 — a latent off-by-filter bug fixed here via
    hvo_seq_index)."""
    from transformergrooveinfilling_tpu.hvo import HVOSequence

    seqs = synthetic_gmd_sequences(6, seed=13)
    silent = seqs[0].copy_empty()
    data = [silent] + seqs[1:]
    ds = GrooveMidiDatasetInfillingSymbolic(
        data=data, dataset_name="FilteredIdx", split="train",
        save_dataset_path=str(tmp_path / "ds"),
        voices_params={"voice_idx": [2], "min_n_voices_to_remove": 1,
                       "max_n_voices_to_remove": 1, "prob": [1], "k": 5},
        max_aug_items=2, seed=3)
    assert len(ds.hvo_sequences) == len(data) - 1  # silent item filtered
    assert len(ds) > 0
    for i in range(len(ds)):
        base = ds.get_hvo_sequence(i)
        # the base must reproduce kept+removed exactly
        merged = np.asarray(ds.processed_inputs[i]) + np.asarray(
            ds.processed_outputs[i])
        np.testing.assert_allclose(np.asarray(base.hvo), merged, atol=1e-6)


def test_legacy_fallback_warns_once_per_site(tmp_path):
    """Pickles without hvo_seq_index fall back to the reference's
    corpus-index lookup (its wrong-sequence bug, dataset.py:352-356) — the
    fallback must warn so users know get_hvo_sequence may be wrong."""
    import warnings

    seqs = synthetic_gmd_sequences(4, seed=7)
    ds = GrooveMidiDatasetInfillingSymbolic(
        data=seqs, dataset_name="LegacyWarn", split="train",
        save_dataset_path=str(tmp_path / "ds"),
        voices_params={"voice_idx": [2], "min_n_voices_to_remove": 1,
                       "max_n_voices_to_remove": 1, "prob": [1], "k": 5},
        max_aug_items=2, seed=3)
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        ds.get_hvo_sequence(0)  # hvo_seq_index present: silent
    del ds.hvo_seq_index  # simulate a legacy pickle
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        ds.get_hvo_sequence(0)
    assert any("hvo_seq_index" in str(w.message) for w in caught)


def test_velocity_heatmap_tabs_skip_empty_subsets():
    """Tab labels must track the non-empty subsets (an empty style previously
    shifted every later panel under the wrong label)."""
    from transformergrooveinfilling_tpu.eval.media import velocity_heatmap_html

    seqs = synthetic_gmd_sequences(2, seed=5)
    html = velocity_heatmap_html(
        {"afrobeat": [], "funk": [seqs[0]], "rock": [seqs[1]]}, "t")
    assert "afrobeat" not in html
    # funk's label is the first tab, and its panel (n=1) is present
    assert html.index("funk") < html.index("rock")
