"""Offline evaluation CLI: the in-training log_eval pass runs from saved
artifacts (checkpoint + preprocessed evaluator pickles) — the evaluation
path multi-host CLI runs are pointed at (train.py auto-disables in-training
evaluators on multi-process runs)."""

import json
import os

import jax
import pytest
import yaml

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture()
def in_repo(monkeypatch):
    from conftest import ensure_dataset_artifacts

    monkeypatch.chdir(REPO)
    monkeypatch.syspath_prepend(REPO)
    ensure_dataset_artifacts("InfillingClosedHH_Symbolic", testing=True,
                             evaluators=True)


def _evaluator_path(split="train"):
    with open(os.path.join(REPO, "configs/paths.yaml")) as f:
        return yaml.safe_load(f)[
            "InfillingClosedHH_Symbolic_testing"]["evaluators"][split]


def test_offline_evaluate_cli(in_repo, tmp_path, capsys):
    from transformergrooveinfilling_tpu import evaluate as eval_cli
    from transformergrooveinfilling_tpu.models import build_model
    from transformergrooveinfilling_tpu.models.transformer import (
        GrooveTransformerConfig,
    )
    from transformergrooveinfilling_tpu.train.checkpoint import save_checkpoint
    from transformergrooveinfilling_tpu.train.loop import (
        create_train_state, make_optimizer,
    )

    config = GrooveTransformerConfig(
        d_model=16, n_heads=2, dim_feedforward=16, num_encoder_layers=1,
        embedding_size_src=27)
    model = build_model(config)
    tx = make_optimizer("sgd", 0.1)
    state = create_train_state(model, config, tx, jax.random.PRNGKey(0))
    ckpt_dir = str(tmp_path / "ckpts")
    save_checkpoint(ckpt_dir, "evalrun", 2, state, 1.5, config=config)

    run_base = str(tmp_path / "eval_runs")
    rc = eval_cli.main(["--ckpt", ckpt_dir,
                        "--evaluator", _evaluator_path("train"),
                        "--media", "1", "--dump", "0",
                        "--run_dir", run_base])
    assert rc == 0
    out = capsys.readouterr().out
    assert "Train_Set: mean hit accuracy" in out
    assert "checkpoint epoch 2" in out

    run_dirs = os.listdir(run_base)
    assert len(run_dirs) == 1
    rdir = os.path.join(run_base, run_dirs[0])
    lines = [json.loads(l) for l in
             open(os.path.join(rdir, "metrics.jsonl"))]
    keys = set().union(*(l.keys() for l in lines))
    # the reference's scalar metric families, byte-named (evaluator.py:522-525)
    assert any("_Hits_Accuracy_" in k for k in keys)
    assert any("_Velocity_MSE_" in k for k in keys)
    assert any("_Micro_Timing_MSE_" in k for k in keys)
    # media pass wrote the feature-stats CSV into the run dir
    assert any(f.startswith("stats_") and f.endswith(".csv")
               for f in os.listdir(rdir))

    # --epoch selects that epoch's checkpoint from the dir (a newer epoch 5
    # exists; epoch 2 must still be loadable), mirroring the reference's
    # load_model {"epoch": N}
    save_checkpoint(ckpt_dir, "evalrun", 5, state, 1.0, config=config)
    rc = eval_cli.main(["--ckpt", ckpt_dir, "--epoch", "2",
                        "--evaluator", _evaluator_path("train"),
                        "--media", "0",
                        "--run_dir", str(tmp_path / "eval_runs2")])
    assert rc == 0
    assert "checkpoint epoch 2" in capsys.readouterr().out
    with pytest.raises(SystemExit, match="no epoch-9"):
        eval_cli.main(["--ckpt", ckpt_dir, "--epoch", "9",
                       "--evaluator", _evaluator_path("train")])

    # --all_epochs: one run holding the whole learning curve (epochs 2 and 5)
    run3 = str(tmp_path / "eval_runs3")
    rc = eval_cli.main(["--ckpt", ckpt_dir, "--all_epochs",
                        "--evaluator", _evaluator_path("train"),
                        "--run_dir", run3])
    assert rc == 0
    out = capsys.readouterr().out
    assert "checkpoint epoch 2" in out and "checkpoint epoch 5" in out
    rdir3 = os.path.join(run3, os.listdir(run3)[0])
    curve = [json.loads(l) for l in
             open(os.path.join(rdir3, "metrics.jsonl"))]
    assert {l.get("epoch") for l in curve if "epoch" in l} >= {2, 5}


def test_offline_evaluate_artifact(in_repo, tmp_path, capsys):
    """--artifact: the log_eval pass runs against an export.py serving
    artifact (no checkpoint, artifact-embedded threshold), through
    InfillServer's batch bucketing."""
    from transformergrooveinfilling_tpu import evaluate as eval_cli
    from transformergrooveinfilling_tpu import export as export_cli
    from transformergrooveinfilling_tpu.models import build_model
    from transformergrooveinfilling_tpu.models.transformer import (
        GrooveTransformerConfig,
    )
    from transformergrooveinfilling_tpu.train.checkpoint import save_checkpoint
    from transformergrooveinfilling_tpu.train.loop import (
        create_train_state, make_optimizer,
    )

    config = GrooveTransformerConfig(
        d_model=16, n_heads=2, dim_feedforward=16, num_encoder_layers=1,
        embedding_size_src=27)
    model = build_model(config)
    tx = make_optimizer("sgd", 0.1)
    state = create_train_state(model, config, tx, jax.random.PRNGKey(0))
    ckpt_dir = str(tmp_path / "ckpts")
    save_checkpoint(ckpt_dir, "artrun", 1, state, 2.0, config=config)
    art = str(tmp_path / "m.tgix")
    assert export_cli.main(["--checkpoint", ckpt_dir, "--out", art,
                            "--batch_sizes", "1,8",
                            "--platforms", "cpu"]) == 0

    run_base = str(tmp_path / "eval_runs_art")
    rc = eval_cli.main(["--artifact", art,
                        "--evaluator", _evaluator_path("validation"),
                        "--media", "0", "--run_dir", run_base])
    assert rc == 0
    out = capsys.readouterr().out
    assert "Validation_Set: mean hit accuracy" in out
    assert "train loss n/a" in out


def test_offline_evaluate_cli_identifier_mismatch(tmp_path):
    from transformergrooveinfilling_tpu import evaluate as eval_cli

    with pytest.raises(SystemExit):
        eval_cli.main(["--ckpt", str(tmp_path), "--evaluator", "a.pickle",
                       "--evaluator", "b.pickle", "--identifier", "One"])


def test_offline_evaluate_cli_no_checkpoint(tmp_path):
    from transformergrooveinfilling_tpu import evaluate as eval_cli

    empty = tmp_path / "empty"
    empty.mkdir()
    with pytest.raises(SystemExit, match="no checkpoint"):
        eval_cli.main(["--ckpt", str(empty), "--evaluator", "x.pickle"])
