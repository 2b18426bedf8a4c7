"""Augmentation fused into the compiled training program."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from transformergrooveinfilling_tpu.data.device_pipeline import (
    make_on_device_augment,
    random_mask_on_device,
)
from transformergrooveinfilling_tpu.data.synthetic import synthetic_gmd_sequences
from transformergrooveinfilling_tpu.hvo import N_VOICES
from transformergrooveinfilling_tpu.models import build_model
from transformergrooveinfilling_tpu.models.transformer import (
    GrooveTransformerConfig,
)
from transformergrooveinfilling_tpu.train.loop import (
    create_train_state,
    make_epoch_fn,
    make_optimizer,
)


def _base(n=8, seed=31):
    seqs = synthetic_gmd_sequences(n, seed=seed)
    return np.stack([s.hvo for s in seqs]).astype(np.float32)


def test_random_mask_partition():
    base = jnp.asarray(_base())
    kept, removed = random_mask_on_device(jax.random.PRNGKey(0), base)
    np.testing.assert_allclose(np.asarray(kept + removed), np.asarray(base),
                               atol=1e-7)
    h_rm = np.asarray(removed[:, :, :N_VOICES])
    assert ((h_rm > 0) <= (np.asarray(base[:, :, :N_VOICES]) > 0)).all()
    assert h_rm.sum() > 0  # something was removed at thres 0.4-0.6

    kept2, _ = random_mask_on_device(jax.random.PRNGKey(1), base)
    assert not np.array_equal(np.asarray(kept), np.asarray(kept2))


def test_symbolic_augment_inside_epoch_trains():
    base = _base(16)
    cfg = GrooveTransformerConfig(d_model=16, n_heads=2, dim_feedforward=16,
                                  dropout=0.0, num_encoder_layers=1,
                                  embedding_size_src=27)
    model = build_model(cfg)
    tx = make_optimizer("sgd", 0.1)
    state = create_train_state(model, cfg, tx, jax.random.PRNGKey(0))
    augment = make_on_device_augment(mode="symbolic")
    epoch_fn = make_epoch_fn(model, tx, 0.5, batch_size=8, n_samples=16,
                             donate=False, n_epochs=3, augment=augment)
    x = jnp.asarray(base)
    state, metrics = epoch_fn(state, x, x, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
    # fresh masks per epoch: a different key gives a different trajectory
    state2 = create_train_state(model, cfg, tx, jax.random.PRNGKey(0))
    _, m2 = epoch_fn(state2, x, x, jax.random.PRNGKey(2))
    assert float(m2["loss"]) != float(metrics["loss"])


def test_audio_augment_matches_manual_pipeline():
    """The fused audio augment == mask → host-route synth+MSO, same key."""
    from transformergrooveinfilling_tpu.ops.mso import mso_batch_from_hvo

    base = jnp.asarray(_base(8))
    qpms = np.full((8,), 120.0)
    augment = make_on_device_augment(qpms=qpms, mode="audio", chunk=4)
    key = jax.random.PRNGKey(7)
    inputs, removed = jax.jit(augment)(key, base, base)
    assert inputs.shape == (8, 32, 16)

    kept, removed_ref = random_mask_on_device(key, base)
    np.testing.assert_allclose(np.asarray(removed), np.asarray(removed_ref),
                               atol=1e-7)
    # exact vs the device route (identical f32 onset arithmetic)
    dev = mso_batch_from_hvo(np.asarray(kept), [None] * 8, qpms,
                             device_synth=True)
    np.testing.assert_allclose(np.asarray(inputs), dev, atol=1e-6)
    # vs the host route: float32 vs float64 onset truncation can shift an
    # onset by one sample at integer boundaries. Per-cell effect is bounded
    # by a single onset's flux (≈1 % of scale, mask-pattern dependent); it
    # touches only frame-boundary cells, so the mean error must stay tiny.
    host = mso_batch_from_hvo(np.asarray(kept), [None] * 8, qpms,
                              device_synth=False)
    scale = np.max(np.abs(host)) + 1e-9
    diff = np.abs(np.asarray(inputs) - host)
    assert diff.max() < 2e-2 * scale
    assert diff.mean() < 5e-4 * scale
    assert (diff > 6e-3 * scale).mean() < 0.05  # isolated boundary cells only


def test_audio_augment_requires_chunk_divisibility():
    base = jnp.asarray(_base(6))
    augment = make_on_device_augment(qpms=np.full((6,), 120.0), mode="audio",
                                     chunk=4)
    with pytest.raises(AssertionError, match="multiple of chunk"):
        jax.jit(augment)(jax.random.PRNGKey(0), base, base)


def test_run_training_with_on_device_augment(tmp_path, monkeypatch):
    from transformergrooveinfilling_tpu.train.config import HyperParams
    from transformergrooveinfilling_tpu.train.driver import run_training

    monkeypatch.chdir(tmp_path)
    base = _base(8)
    qpms = np.full((8,), 120.0)

    class DS:
        processed_inputs = base
        processed_outputs = base

    hp = HyperParams.from_dict({
        "experiment": "InfillingRandom", "encoder_only": 1,
        "optimizer_algorithm": "sgd", "d_model": 16, "n_heads": 2,
        "dropout": 0.1, "num_encoder_decoder_layers": 1,
        "hit_loss_penalty": 0.5, "batch_size": 8, "dim_feedforward": 16,
        "learning_rate": 0.05, "epochs": 2})
    augment = make_on_device_augment(qpms=qpms, mode="audio", chunk=4)
    bundle = run_training(hp, DS(), {}, on_device_augment=augment,
                          augment_per_epoch=False, epoch_block=2,
                          log_media=False, ckpt_dir=str(tmp_path / "ck"))
    assert bundle.state is not None


def test_augment_once_applies_in_single_epoch_block():
    """augment_per_epoch=False must still augment when the compiled block is a
    single epoch (the trailing partial block of run_training, or
    epoch_block=1) — previously those epochs silently trained on the clean
    un-augmented base grids."""
    base = _base(16)
    cfg = GrooveTransformerConfig(d_model=16, n_heads=2, dim_feedforward=16,
                                  dropout=0.0, num_encoder_layers=1,
                                  embedding_size_src=27)
    model = build_model(cfg)
    tx = make_optimizer("sgd", 0.0)  # lr 0: pure measurement
    state = create_train_state(model, cfg, tx, jax.random.PRNGKey(0))
    augment = make_on_device_augment(mode="symbolic")
    x = jnp.asarray(base)
    kw = dict(batch_size=8, n_samples=16, donate=False, shuffle=False)
    fn_aug = make_epoch_fn(model, tx, 0.5, n_epochs=1, augment=augment,
                           augment_per_epoch=False, **kw)
    fn_clean = make_epoch_fn(model, tx, 0.5, n_epochs=1, **kw)
    _, m_aug = fn_aug(state, x, x, jax.random.PRNGKey(1))
    _, m_clean = fn_clean(state, x, x, jax.random.PRNGKey(1))
    # clean-grids loss (input == target) differs from the masked->removed task
    assert float(m_aug["loss"]) != float(m_clean["loss"])
