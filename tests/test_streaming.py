"""Streaming-augmentation reachability + amortized regeneration (VERDICT r2
directive #1): partial 1/k regeneration, driver regen cadence (fixed + auto),
and the train.py --streaming CLI path on a reference-shaped dataset."""

import os
import sys

import numpy as np
import pytest

from transformergrooveinfilling_tpu.data.pipeline import StreamingAugmenter
from transformergrooveinfilling_tpu.data.synthetic import synthetic_gmd_sequences
from transformergrooveinfilling_tpu.train.config import HyperParams
from transformergrooveinfilling_tpu.train.driver import run_training

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

HP = {
    "experiment": "InfillingClosedHH_Symbolic", "encoder_only": 1,
    "optimizer_algorithm": "sgd", "d_model": 16, "n_heads": 2,
    "dropout": 0.1, "num_encoder_decoder_layers": 1,
    "hit_loss_penalty": 0.5, "batch_size": 8, "dim_feedforward": 16,
    "learning_rate": 0.05, "epochs": 6}


def _base(n=16, seed=60):
    seqs = synthetic_gmd_sequences(n, seed=seed)
    return np.stack([s.hvo for s in seqs]).astype(np.float32)


def test_partial_regeneration_rolls_through_corpus():
    """partial=2: each generation rebuilds one rotating half; the other half
    carries over bit-identically, and the caller's previous generation is
    never mutated underneath it (fresh copies per generation)."""
    base = _base(16)
    with StreamingAugmenter(base, aug_per_item=2, mode="symbolic",
                            seed=7, partial=2) as st:
        g0 = st.next_epoch()
        g0_snapshot = (g0[0].copy(), g0[1].copy())
        g1 = st.next_epoch()
        g2 = st.next_epoch()
    n = st.n_samples
    half = n // 2
    # gen1 rebuilt the second half (slice 1 % 2), kept the first
    np.testing.assert_array_equal(g1[0][:half], g0[0][:half])
    assert not np.array_equal(g1[0][half:], g0[0][half:])
    # gen2 rebuilt the first half, kept gen1's second half
    np.testing.assert_array_equal(g2[0][half:], g1[0][half:])
    assert not np.array_equal(g2[0][:half], g1[0][:half])
    # no aliasing: g0 still holds its original values
    np.testing.assert_array_equal(g0[0], g0_snapshot[0])
    np.testing.assert_array_equal(g0[1], g0_snapshot[1])
    # masking invariant on every generation: kept + removed == base rows
    stacked = np.repeat(base, 2, axis=0)
    for g in (g0, g1, g2):
        np.testing.assert_allclose(g[0] + g[1], stacked)


class _CountingStreamer:
    """Deterministic fake streamer recording next_epoch calls."""

    def __init__(self, n, gen_seconds=0.0):
        self.n_samples = n
        self.calls = 0
        self.last_generation_seconds = gen_seconds
        rng = np.random.default_rng(0)
        h = (rng.random((n, 32, 9)) < 0.3).astype(np.float32)
        self._y = np.concatenate([h, h * 0.8, h * 0.1], 2).astype(np.float32)

    def next_epoch(self, timeout=None):
        self.calls += 1
        return self._y.copy(), self._y.copy()


def _ds(n):
    class D:
        processed_inputs = np.zeros((n, 32, 27), np.float32)
        processed_outputs = np.zeros((n, 32, 27), np.float32)
    return D()


def test_regen_cadence_fixed(tmp_path, monkeypatch):
    """regen_cadence=2 with 6 one-epoch blocks → 3 generation swaps."""
    monkeypatch.chdir(tmp_path)
    st = _CountingStreamer(16)
    hp = HyperParams.from_dict(HP)
    run_training(hp, _ds(16), {}, streamer=st, regen_cadence=2,
                 log_media=False, ckpt_dir=str(tmp_path / "ck"))
    assert st.calls == 3


def test_regen_cadence_auto_backs_off_when_generation_slow(tmp_path,
                                                           monkeypatch,
                                                           capsys):
    """auto cadence: a generation far slower than a block pushes the swap
    cadence up after the first block (1 initial swap + no further swaps
    within 6 blocks)."""
    monkeypatch.chdir(tmp_path)
    st = _CountingStreamer(16, gen_seconds=1e6)
    hp = HyperParams.from_dict(HP)
    run_training(hp, _ds(16), {}, streamer=st, regen_cadence="auto",
                 log_media=False, ckpt_dir=str(tmp_path / "ck"))
    assert st.calls == 1
    assert "auto regen cadence" in capsys.readouterr().out


def test_regen_cadence_validation(tmp_path):
    hp = HyperParams.from_dict(HP)
    with pytest.raises(ValueError, match="regen_cadence"):
        run_training(hp, _ds(16), {}, streamer=_CountingStreamer(16),
                     regen_cadence=0, log_media=False,
                     ckpt_dir=str(tmp_path / "ck"))


@pytest.fixture()
def in_repo(monkeypatch):
    from conftest import ensure_dataset_artifacts

    monkeypatch.chdir(REPO)
    monkeypatch.syspath_prepend(REPO)
    ensure_dataset_artifacts("InfillingRandom", testing=True)


def _cli(*extra):
    return ["--experiment", "InfillingRandom_testing", "--epochs", "2",
            "--batch_size", "8", "--d_model", "16", "--n_heads", "2",
            "--dim_feedforward", "16", "--num_encoder_decoder_layers", "1",
            "--learning_rate", "0.05", "--dropout", "0.1",
            "--hit_loss_penalty", "0.5",
            "--wandb", "False", "--eval_train", "False",
            "--eval_validation", "False", "--dump_eval", "False",
            *extra]


def test_cli_streaming_host(in_repo, tmp_path, capsys):
    """The north-star streaming path is reachable from the production CLI:
    --streaming host trains the Random experiment on fresh per-generation
    maskings + renders (host front end on CPU)."""
    import train as train_cli

    # --testing forces epochs=1; 2 epochs here exercise a swap + a reuse
    train_cli.main(_cli("--streaming", "host", "--regen_cadence", "1",
                        "--regen_partial", "2", "--aug_per_item", "2",
                        "--ckpt_dir", str(tmp_path / "ck")))
    out = capsys.readouterr().out
    assert "streaming(host)" in out


def test_cli_streaming_rejects_voice_combination_experiments(monkeypatch):
    """--streaming on a voice-combination experiment exits with a clear
    message (its augmentation is not random-event masking)."""
    import train as train_cli

    monkeypatch.chdir(REPO)
    from conftest import ensure_dataset_artifacts

    ensure_dataset_artifacts("InfillingClosedHH_Symbolic", testing=True)
    with pytest.raises(SystemExit, match="streaming"):
        train_cli.main([
            "--experiment", "InfillingClosedHH_Symbolic_testing",
            "--epochs", "1", "--batch_size", "8", "--d_model", "16",
            "--n_heads", "2", "--dim_feedforward", "16",
            "--num_encoder_decoder_layers", "1",
            "--wandb", "False", "--eval_train", "False",
            "--eval_validation", "False", "--dump_eval", "False",
            "--streaming", "host"])


def test_setup_streaming_fused_builds_aligned_dataset(in_repo):
    """--streaming fused: clean grids repeat by the fan-out and trim to the
    synth kernel's 64-item chunks; the augment hook is returned jittable."""
    import train as train_cli
    from transformergrooveinfilling_tpu.data import load_processed_dataset

    ds = load_processed_dataset(
        "datasets/InfillingRandom_testing/0.0.0/train",
        exp="InfillingRandom_testing")
    assert hasattr(ds, "thres_range")  # prefix dispatch picked Random class
    args = train_cli.parse_args(_cli("--streaming", "fused",
                                     "--aug_per_item", "4"))
    streamer, augment, ds_t = train_cli._setup_streaming(args, ds)
    assert streamer is None and augment is not None
    assert ds_t.processed_inputs.shape[0] % 64 == 0
    assert ds_t.processed_inputs.shape[0] > 0


def test_delta_api_matches_full_view():
    """next_epoch_delta ships only the rebuilt slab; applying the deltas over
    the previous full view reproduces next_epoch's arrays exactly."""
    base = _base(16, seed=61)
    with StreamingAugmenter(base, aug_per_item=2, mode="symbolic",
                            seed=9, partial=4) as st:
        sl0, fi0, fo0 = st.next_epoch_delta()
        assert sl0 is None  # first generation is always full
        cur_in, cur_out = fi0.copy(), fo0.copy()
        for _ in range(4):
            sl, fi, fo = st.next_epoch_delta()
            assert sl is not None
            assert fi.shape[0] == fo.shape[0] == sl.stop - sl.start
            cur_in[sl] = fi
            cur_out[sl] = fo
    stacked = np.repeat(base, 2, axis=0)
    np.testing.assert_allclose(cur_in + cur_out, stacked)


@pytest.mark.parametrize("axis", ["tp", "pp"])
def test_streaming_composes_with_model_sharding(axis, tmp_path, monkeypatch):
    """Streaming augmentation composes with the model-sharding axes: the
    delta-updated data arrays feed a tensor-parallel (dp×tp) and a pipelined
    (dp×pp) epoch program without resharding errors (the driver places
    streamed generations with plain jnp.asarray and lets the sharded program
    consume them — this pins that that stays valid for every plan kind)."""
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    if axis == "tp":
        from transformergrooveinfilling_tpu.parallel.mesh import make_mesh

        plan = make_mesh(n_data=4, n_model=2)
    else:
        from transformergrooveinfilling_tpu.parallel.pipeline import (
            make_pipeline_mesh,
        )

        plan = make_pipeline_mesh(n_stages=2, n_data=2, n_micro=2)
    monkeypatch.chdir(tmp_path)
    base = _base(8, seed=63)
    hp = HyperParams.from_dict(dict(HP, epochs=2,
                                    num_encoder_decoder_layers=2))
    with StreamingAugmenter(base, aug_per_item=2, mode="symbolic",
                            seed=3, partial=2) as st:
        class D:
            processed_inputs = np.zeros((st.n_samples, 32, 27), np.float32)
            processed_outputs = np.zeros((st.n_samples, 32, 27), np.float32)
        bundle = run_training(hp, D(), {}, streamer=st, regen_cadence=1,
                              plan=plan, log_media=False,
                              ckpt_dir=str(tmp_path / "ck"))
    assert bundle.state is not None


def test_driver_consumes_delta_stream(tmp_path, monkeypatch):
    """run_training trains through the delta path (partial streamer) with a
    finite loss — the resident device arrays are slab-updated in place."""
    monkeypatch.chdir(tmp_path)
    base = _base(8, seed=62)
    hp = HyperParams.from_dict(dict(HP, epochs=4))
    with StreamingAugmenter(base, aug_per_item=2, mode="symbolic",
                            seed=3, partial=2) as st:
        class D:
            processed_inputs = np.zeros((st.n_samples, 32, 27), np.float32)
            processed_outputs = np.zeros((st.n_samples, 32, 27), np.float32)
        bundle = run_training(hp, D(), {}, streamer=st, regen_cadence=1,
                              log_media=False, ckpt_dir=str(tmp_path / "ck"))
    assert bundle.state is not None
