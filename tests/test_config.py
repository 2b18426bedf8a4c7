"""Config system: reference YAMLs load unchanged; derived-params logic."""

import glob
import os

import pytest
import yaml

from transformergrooveinfilling_tpu.train.config import (
    HyperParams,
    derive_model_config,
    embedding_size_src_for,
    load_hyperparameters,
    load_paths,
)

REFERENCE_CONFIGS = "/root/reference/configs"


def test_our_configs_load():
    for path in glob.glob("configs/*_training.yaml"):
        hp = load_hyperparameters(path)
        assert hp.experiment
        cfg = derive_model_config(hp)
        assert cfg.max_len == 32 and cfg.embedding_size_tgt == 27


@pytest.mark.skipif(not os.path.isdir(REFERENCE_CONFIGS),
                    reason="reference configs unavailable")
def test_reference_training_configs_load_unchanged():
    """North-star requirement (SURVEY.md §5.6): the reference's exact YAML
    files must be consumable as-is."""
    paths = glob.glob(os.path.join(REFERENCE_CONFIGS, "*_training.yaml"))
    paths += glob.glob(os.path.join(REFERENCE_CONFIGS,
                                    "InfillingRandom_test_large.yaml"))
    assert paths
    for path in paths:
        hp = load_hyperparameters(path)
        cfg = derive_model_config(hp)
        assert cfg.num_encoder_layers == hp.num_encoder_decoder_layers
        if hp.encoder_only:
            assert cfg.num_decoder_layers == 0
        assert cfg.embedding_size_src == (
            27 if "Symbolic" in hp.experiment else 16)


@pytest.mark.skipif(not os.path.isdir(REFERENCE_CONFIGS),
                    reason="reference configs unavailable")
def test_reference_paths_yaml_loads():
    paths = load_paths(os.path.join(REFERENCE_CONFIGS, "paths.yaml"))
    assert "InfillingClosedHH" in paths
    assert "datasets" in paths["InfillingClosedHH"]


@pytest.mark.skipif(not os.path.isdir(REFERENCE_CONFIGS),
                    reason="reference configs unavailable")
def test_reference_sweep_yaml_samples():
    """Our sweep runner consumes the reference's sweep schema directly."""
    import random
    import sweep as sweep_cli

    with open(os.path.join(REFERENCE_CONFIGS,
                           "InfillingKicksAndSnares_sweep.yaml")) as f:
        spec = yaml.safe_load(f)
    rng = random.Random(0)
    cfg = sweep_cli.sample_config(spec, rng)
    assert cfg["experiment"] == "InfillingKicksAndSnares"
    assert cfg["batch_size"] in spec["parameters"]["batch_size"]["values"]
    assert 0.1 <= cfg["dropout"] <= 0.3
    assert 6 <= cfg["num_encoder_decoder_layers"] <= 12


def test_demo_checkpoint_config_derivation():
    """The testing config derives exactly the demo checkpoint's architecture."""
    hp = HyperParams.from_dict({
        "experiment": "InfillingClosedHH_testing", "batch_size": 32,
        "d_model": 32, "dim_feedforward": 16, "dropout": 0.18,
        "optimizer_algorithm": "sgd", "learning_rate": 0.094, "n_heads": 4,
        "num_encoder_decoder_layers": 6, "epochs": 1, "encoder_only": 1,
        "hit_loss_penalty": 0.47, "load_model": None})
    cfg = derive_model_config(hp)
    assert (cfg.d_model, cfg.n_heads, cfg.dim_feedforward,
            cfg.num_encoder_layers, cfg.embedding_size_src) == (32, 4, 16, 6, 16)


def test_fused_decoder_layer_auto_resolution():
    """None = auto: the decoder kernel follows the encoder kernel's
    width/topology gate (adopted on the measured +25 % enc-dec win,
    docs/PERF.md round 4) — and stays False for encoder-only models."""
    base = {"experiment": "InfillingRandom", "d_model": 256, "n_heads": 2,
            "dim_feedforward": 512, "dropout": 0.3,
            "num_encoder_decoder_layers": 6, "batch_size": 512,
            "learning_rate": 0.089, "epochs": 1, "hit_loss_penalty": 0.73}
    encdec = derive_model_config(
        HyperParams.from_dict({**base, "encoder_only": 0}))
    assert encdec.fused_decoder_layer  # qualifying width, single device
    enc = derive_model_config(
        HyperParams.from_dict({**base, "encoder_only": 1}))
    assert not enc.fused_decoder_layer  # no decoder stack
    # non-qualifying width (head dim 256/8=32): auto stays off
    narrow = derive_model_config(HyperParams.from_dict(
        {**base, "encoder_only": 0, "n_heads": 8}))
    assert not narrow.fused_decoder_layer
    # explicit override still wins
    forced = derive_model_config(HyperParams.from_dict(
        {**base, "encoder_only": 0, "n_heads": 8,
         "fused_decoder_layer": True}))
    assert forced.fused_decoder_layer


def test_encoder_decoder_variant(rng):
    """encoder_only=0 builds the full enc-dec model and it runs."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from transformergrooveinfilling_tpu.models import build_model

    hp = HyperParams.from_dict({
        "experiment": "InfillingClosedHH", "encoder_only": 0, "d_model": 16,
        "n_heads": 2, "dim_feedforward": 16, "dropout": 0.1,
        "num_encoder_decoder_layers": 2, "batch_size": 4,
        "learning_rate": 0.05, "epochs": 1, "hit_loss_penalty": 1.0})
    cfg = derive_model_config(hp)
    assert cfg.num_decoder_layers == 2
    model = build_model(cfg)
    x = jnp.asarray(rng.standard_normal((2, 32, 16)), jnp.float32)
    tgt = jnp.asarray(rng.standard_normal((2, 32, 27)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x, tgt,
                        deterministic=True)["params"]
    h, v, o = model.apply({"params": params}, x, tgt, deterministic=True)
    assert h.shape == (2, 32, 9)
    assert "decoder_layer_0" in params and "decoder_norm" in params
    # gradients flow through the decoder
    def loss(p):
        hh, vv, oo = model.apply({"params": p}, x, tgt, deterministic=True)
        return (hh ** 2).mean() + (vv ** 2).mean()
    g = jax.grad(loss)(params)
    gnorm = np.asarray(
        jnp.abs(g["decoder_layer_0"]["cross_attn"]["q"]["kernel"]).max())
    assert gnorm > 0


def test_encoder_decoder_trains_end_to_end(rng):
    """encoder_only=0: teacher-forced training reduces the loss."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from transformergrooveinfilling_tpu.models import build_model
    from transformergrooveinfilling_tpu.train.loop import (
        create_train_state, make_epoch_fn, make_eval_loss_fn, make_optimizer)

    hp = HyperParams.from_dict({
        "experiment": "InfillingKicksAndSnares", "encoder_only": 0,
        "d_model": 16, "n_heads": 2, "dim_feedforward": 32, "dropout": 0.1,
        "num_encoder_decoder_layers": 1, "batch_size": 8,
        "learning_rate": 0.05, "epochs": 1, "hit_loss_penalty": 0.5,
        "optimizer_algorithm": "adam"})
    cfg = derive_model_config(hp)
    assert not cfg.encoder_only
    model = build_model(cfg)
    tx = make_optimizer("adam", 1e-3)
    state = create_train_state(model, cfg, tx, jax.random.PRNGKey(0))

    h = (rng.random((16, 32, 9)) < 0.3).astype(np.float32)
    y = jnp.asarray(np.concatenate([h, h * 0.7, h * 0.1], 2), np.float32)
    x = jnp.asarray(rng.standard_normal((16, 32, 16)), jnp.float32)
    epoch_fn = make_epoch_fn(model, tx, 0.5, 8, 16, donate=False,
                             encoder_only=False)
    _, first = epoch_fn(state, x, y, jax.random.PRNGKey(1))
    for i in range(20):
        state, metrics = epoch_fn(state, x, y, jax.random.PRNGKey(2 + i))
    assert float(metrics["loss"]) < float(first["loss"])

    eval_fn = make_eval_loss_fn(model, 0.5, encoder_only=False)
    out = eval_fn(state.params, x, y)
    assert np.isfinite(float(out["loss"]))


def test_encoder_decoder_cli_end_to_end(tmp_path, monkeypatch):
    """The reference supports encoder_only=0 full encoder-decoder training
    (train.py:125-127); the whole CLI path must run it: config load → model
    build (decoder layers) → teacher-forced training → eval logging."""
    import os
    import shutil

    import yaml

    import train as train_cli

    from tests.conftest import ensure_dataset_artifacts

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ensure_dataset_artifacts("InfillingClosedHH_Symbolic", testing=True,
                             evaluators=True)
    with open(os.path.join(repo,
              "configs/InfillingClosedHH_Symbolic_testing_training.yaml")) as f:
        cfg = yaml.safe_load(f)
    cfg["encoder_only"] = 0
    cfg["num_encoder_decoder_layers"] = 1  # keep the CPU run quick
    cfg["d_model"] = 16
    cfg["n_heads"] = 2
    path = tmp_path / "encdec.yaml"
    path.write_text(yaml.safe_dump(cfg))

    monkeypatch.chdir(repo)
    rc = train_cli.main(["--config", str(path), "--wandb", "False",
                         "--dump_eval", "False", "--eval_test", "False",
                         "--only_final_eval", "True"])
    assert rc in (0, None)


def test_resolve_remat_auto_and_forced():
    """Auto-remat engages only when the activation estimate overflows HBM:
    GrooveXL at bs 128 fits (remat off — measured +26 % faster, docs/PERF.md)
    while bs 1024 does not; explicit 0/1 always wins."""
    import jax.numpy as jnp

    from transformergrooveinfilling_tpu.train.config import resolve_remat

    xl = dict(d_model=1024, n_heads=16, dim_feedforward=4096, n_layers=12,
              compute_dtype=jnp.bfloat16, hbm_bytes=16 * 1024**3,
              n_data_shards=1)
    assert resolve_remat(None, batch_size=128, **xl) is False
    assert resolve_remat(None, batch_size=1024, **xl) is True
    assert resolve_remat(True, batch_size=128, **xl) is True
    assert resolve_remat(False, batch_size=1024, **xl) is False
    # the estimate is PER DEVICE: global batch 1024 over an 8-chip dp mesh
    # is the measured bs-128 per-chip case — remat must stay off
    xl8 = dict(xl, n_data_shards=8)
    assert resolve_remat(None, batch_size=1024, **xl8) is False
    # K stacked sweep replicas on one device multiply everything
    assert resolve_remat(None, batch_size=128, n_replicas=16, **xl) is True
    # adam's extra optimizer copy and decoder layers both count
    near = dict(d_model=1024, n_heads=16, dim_feedforward=4096, n_layers=12,
                compute_dtype=jnp.bfloat16, hbm_bytes=16 * 1024**3,
                n_data_shards=1, batch_size=640)
    assert resolve_remat(None, **near) is False
    assert resolve_remat(None, n_decoder_layers=6, **near) is True
    # flagship config: far under budget
    assert resolve_remat(None, d_model=256, n_heads=2, dim_feedforward=512,
                         n_layers=6, batch_size=512, n_data_shards=1,
                         compute_dtype=jnp.bfloat16,
                         hbm_bytes=16 * 1024**3) is False


def test_device_hbm_bytes(monkeypatch):
    """HBM capacity comes from the device_kind string (local PJRT attribute
    — never memory_stats(), which hangs on tunneled backends) with a
    validated TGI_HBM_BYTES override."""
    from types import SimpleNamespace

    import jax
    import pytest

    from transformergrooveinfilling_tpu.train import config as cfg

    monkeypatch.delenv("TGI_HBM_BYTES", raising=False)
    # cpu backend: unknown kind → conservative v5e default
    assert cfg.device_hbm_bytes() == 16 * 1024**3
    # generation mapping, incl. v5p winning over the plain-v5 match
    for kind, gib in [("TPU v5p", 95), ("TPU v5 lite", 16), ("TPU v4", 32),
                      ("TPU v6 lite", 32), ("TPU v3", 16), ("TPU v2", 8)]:
        monkeypatch.setattr(jax, "devices", lambda k=kind: [
            SimpleNamespace(device_kind=k)])
        assert cfg.device_hbm_bytes() == gib * 1024**3, kind
    # env override: plain bytes and scientific notation
    monkeypatch.setenv("TGI_HBM_BYTES", "32e9")
    assert cfg.device_hbm_bytes() == 32_000_000_000
    # invalid / non-positive values warn and fall back to detection
    for bad in ("16G", "0", ""):
        monkeypatch.setenv("TGI_HBM_BYTES", bad)
        if bad:
            with pytest.warns(UserWarning):
                v = cfg.device_hbm_bytes()
        else:
            v = cfg.device_hbm_bytes()
        assert v == 8 * 1024**3  # still the (monkeypatched v2) detection
