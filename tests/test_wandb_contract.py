"""The real-wandb call surface, pinned with an injected fake (VERDICT r1 #6).

utils/logging.py routes to the real wandb package when importable and online;
that branch was previously asserted-but-untested. Here a recording fake stands
in for the package, so every call-through (init/log/save/watch/finish and the
ensure_configured gate) is exercised with the exact signatures the reference
uses (/root/reference/train.py:106-150, dataset.py:144-146).

Also covers the wandb-location checkpoint restore (reference
tutorial.py:98-105): a pre-downloaded run directory restores offline; a
missing download raises the documented network-needed error.
"""

import types

import numpy as np
import pytest

import jax

from transformergrooveinfilling_tpu.models import build_model
from transformergrooveinfilling_tpu.models.transformer import (
    GrooveTransformerConfig,
)
from transformergrooveinfilling_tpu.train import checkpoint as ckpt
from transformergrooveinfilling_tpu.utils import logging as xlog

CFG = GrooveTransformerConfig(
    d_model=16, n_heads=2, dim_feedforward=16, dropout=0.0,
    num_encoder_layers=1, embedding_size_src=16)


class FakeWandb(types.SimpleNamespace):
    def __init__(self):
        super().__init__()
        self.calls = []
        self.config = {}

    def init(self, config=None, project=None, job_type=None, notes=None,
             tags=None, **kw):
        self.calls.append(("init", {"config": config, "project": project,
                                    "job_type": job_type, "notes": notes}))
        self.config = dict(config or {})
        return types.SimpleNamespace(dir="/tmp/fake", id="fake0", project=project)

    def log(self, data, commit=True):
        self.calls.append(("log", {"data": data, "commit": commit}))

    def save(self, path, base_path=None):
        self.calls.append(("save", {"path": path, "base_path": base_path}))

    def watch(self, model, log_freq=1000):
        self.calls.append(("watch", {"log_freq": log_freq}))

    def finish(self):
        self.calls.append(("finish", {}))

    class Html:
        def __init__(self, html):
            self.html = html

    class Audio:
        def __init__(self, data, sample_rate=44100, caption=None):
            self.data = data
            self.sample_rate = sample_rate
            self.caption = caption


@pytest.fixture()
def fake_wandb(monkeypatch):
    fake = FakeWandb()
    monkeypatch.setattr(xlog, "_real_wandb", fake)
    monkeypatch.delenv("WANDB_MODE", raising=False)
    return fake


def test_online_branch_routes_every_call(fake_wandb):
    assert xlog._wandb_online()
    run = xlog.init(config={"learning_rate": 0.1}, project="InfillingRandom",
                    job_type="train", notes="n")
    assert run.project == "InfillingRandom"
    xlog.log({"loss": 1.0, "epoch": 0}, commit=False)
    xlog.log({"epoch": 0}, commit=True)
    xlog.save("model.ckpt", base_path="/tmp")
    xlog.watch(object(), log_freq=1000)
    assert xlog.ensure_configured()  # dataset.py:145 gate
    xlog.finish()

    kinds = [k for k, _ in fake_wandb.calls]
    assert kinds == ["init", "log", "log", "save", "watch", "finish"]
    init_kw = fake_wandb.calls[0][1]
    assert init_kw["config"] == {"learning_rate": 0.1}
    assert init_kw["job_type"] == "train"
    assert fake_wandb.calls[1][1]["commit"] is False
    assert fake_wandb.calls[3][1] == {"path": "model.ckpt", "base_path": "/tmp"}
    assert fake_wandb.calls[4][1]["log_freq"] == 1000


def test_offline_mode_env_bypasses_real_wandb(fake_wandb, monkeypatch,
                                              tmp_path):
    """WANDB_MODE=offline must route to the local sink even when the package
    is importable (reference train.py:103 --wandb=False behavior)."""
    monkeypatch.setenv("WANDB_MODE", "offline")
    monkeypatch.chdir(tmp_path)
    run = xlog.init(config={"a": 1}, project="P")
    xlog.log({"loss": 2.0}, commit=True)
    xlog.finish()
    assert not fake_wandb.calls  # the fake never saw a call
    assert (tmp_path / "runs" / "P" / run.id / "metrics.jsonl").exists()


def _state(seed=0):
    from transformergrooveinfilling_tpu.train.loop import (
        create_train_state, make_optimizer)

    model = build_model(CFG)
    tx = make_optimizer("sgd", 0.05)
    return create_train_state(model, CFG, tx, jax.random.PRNGKey(seed))


def test_wandb_location_restore_from_downloaded_run_dir(tmp_path):
    """location='wandb' + a pre-downloaded run dir (files/ layout) restores
    offline, exactly like the reference's wandb checkpoint path."""
    files = tmp_path / "run-20260816_000000-abc123" / "files"
    files.mkdir(parents=True)
    state = _state()
    ckpt.save_checkpoint(str(files), "abc123", 4, state, 1.5, CFG)

    params, opt_state, initial = ckpt.restore(
        {"location": "wandb", "dir": str(tmp_path / "run-20260816_000000-abc123"),
         "run": "abc123", "epoch": 4}, CFG)
    assert initial == 5 and opt_state is not None
    np.testing.assert_allclose(
        params["output"]["proj"]["bias"],
        np.asarray(state.params["output"]["proj"]["bias"]))


def test_wandb_location_without_download_raises_clear_error(tmp_path):
    with pytest.raises(NotImplementedError, match="network access"):
        ckpt.restore({"location": "wandb", "dir": str(tmp_path / "nope"),
                      "run": "xyz"}, CFG)


def test_unknown_location_raises(tmp_path):
    with pytest.raises(ValueError, match="unknown checkpoint location"):
        ckpt.restore({"location": "s3", "dir": str(tmp_path)}, CFG)


def test_online_branch_aliases_config_and_converts_media(fake_wandb):
    """Round-2 fixes: after a real-wandb init, xlog.config IS wandb.config
    (dataset self-registration reaches the service), and local Html/Audio
    stubs convert to the real wandb media classes before wandb.log sees
    them (real wandb cannot serialize foreign objects)."""
    xlog.init(config={"lr": 0.1}, project="P")
    assert xlog.config is fake_wandb.config
    xlog.config.update({"d_model": 32})
    assert fake_wandb.config["d_model"] == 32

    media = {"roll": xlog.Html("<svg/>"),
             "audio": [xlog.Audio(np.zeros(4), caption="c")],
             "loss": 1.0}
    xlog.log(media)
    logged = fake_wandb.calls[-1][1]["data"]
    assert isinstance(logged["roll"], FakeWandb.Html)
    assert logged["roll"].html == "<svg/>"
    assert isinstance(logged["audio"][0], FakeWandb.Audio)
    assert logged["audio"][0].caption == "c"
    assert logged["loss"] == 1.0
    xlog.finish()
