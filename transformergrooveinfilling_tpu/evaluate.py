"""Offline evaluation CLI: the full ``log_eval`` pass from saved artifacts.

The reference evaluates only *inside* a training run (reference train.py:219-250
calls ``log_eval`` per scheduled epoch); there is no way to re-score a past
checkpoint. This CLI runs the identical evaluation pass — per-voice metric
families, media (audio + piano rolls + heatmaps), the feature-stats CSV/HTML,
and the optional ``.Eval`` dump (reference evaluator.py:516-605) — from a
checkpoint file and preprocessed evaluator pickles, outside any run:

    python -m transformergrooveinfilling_tpu.evaluate \
        --ckpt checkpoints/<run-dir-or-file> \
        --evaluator <evaluator.pickle> [--evaluator <another> ...] \
        [--identifier Validation_Set ...] [--media 1] [--dump 0] [--epoch N]

This is also how multi-host jobs evaluate: ``train.py`` auto-disables
in-training evaluators when ``jax.process_count() > 1`` and points here.

Native ``.ckpt`` files carry their model config; for legacy reference
``.Model`` files pass the architecture flags explicitly (same contract as
``serve.py``).
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def _default_identifier(path: str) -> str:
    """Reference identifiers are ``{Split}_Set`` (train.py:219-250)."""
    name = os.path.basename(path).lower()
    for split in ("validation", "train", "test"):
        if split in name:
            return f"{split.capitalize()}_Set"
    stem = os.path.splitext(os.path.basename(path))[0]
    return stem or "Eval_Set"


def main(argv=None) -> int:
    p = argparse.ArgumentParser(
        description="Re-score a checkpoint with preprocessed evaluators "
                    "(the in-training log_eval pass, offline)")
    p.add_argument("--ckpt",
                   help=".ckpt/.Model file, or a directory (newest epoch wins)")
    p.add_argument("--artifact",
                   help="evaluate an export.py artifact (.tgix) instead of a "
                        "checkpoint — no model code needed; the artifact's "
                        "embedded threshold applies")
    p.add_argument("--evaluator", action="append", required=True,
                   help="preprocessed evaluator pickle (repeatable)")
    p.add_argument("--identifier", action="append", default=None,
                   help="identifier per evaluator, in order (default: "
                        "{Split}_Set derived from the filename)")
    p.add_argument("--media", default="1",
                   help="1 = render media + stats CSV (reference log_media)")
    p.add_argument("--dump", default="0",
                   help="1 = dump the evaluator .Eval file per reference")
    p.add_argument("--epoch", type=int, default=None,
                   help="with a --ckpt directory: select this epoch's "
                        "checkpoint (default: newest); also the epoch label "
                        "in the logs")
    p.add_argument("--all_epochs", action="store_true",
                   help="with a --ckpt directory: re-score EVERY saved "
                        "epoch into one run (a learning curve from "
                        "artifacts); media/dump are skipped per epoch")
    p.add_argument("--run_dir", default=None,
                   help="base dir for the metrics/media run (default "
                        "runs/offline_eval)")
    # legacy-.Model architecture flags (native checkpoints embed their config)
    p.add_argument("--d_model", type=int, default=32)
    p.add_argument("--n_heads", type=int, default=4)
    p.add_argument("--dim_feedforward", type=int, default=16)
    p.add_argument("--num_encoder_layers", type=int, default=6)
    p.add_argument("--embedding_size_src", type=int, default=16)
    args = p.parse_args(argv)

    idents = list(args.identifier or [])
    if idents and len(idents) != len(args.evaluator):
        p.error(f"--identifier given {len(idents)} times for "
                f"{len(args.evaluator)} evaluators (must match, in order)")

    if bool(args.ckpt) == bool(args.artifact):
        p.error("exactly one of --ckpt / --artifact is required")

    # offline by default, matching the CLI's purpose and the --run_dir
    # contract; export WANDB_MODE=online explicitly to upload instead
    os.environ.setdefault("WANDB_MODE", "offline")

    from .models.transformer import GrooveTransformerConfig
    from .train import checkpoint as ckpt_mod

    if args.artifact:
        if args.all_epochs:
            p.error("--all_epochs applies to --ckpt directories, not "
                    "artifacts")
        # serving-artifact path: the AOT predict handles thresholding with
        # the artifact's embedded settings; InfillServer's bucketing maps
        # arbitrary evaluator sizes onto the fixed exported batch sizes
        from .serve import InfillServer

        server = InfillServer.from_exported(args.artifact)
        config = server.config

        class _ArtifactModel:
            def predict(self, inputs, use_thres: bool = True,
                        thres: float = 0.5):
                hvo = server.infill(np.asarray(inputs, np.float32))
                return list(np.split(hvo, 3, axis=2))

        bundle = _ArtifactModel()
        epoch = 0 if args.epoch is None else args.epoch
        loss = float("nan")
        path = args.artifact
        return _evaluate(args, bundle, config, epoch, loss, path)

    legacy_config = GrooveTransformerConfig(
        d_model=args.d_model, n_heads=args.n_heads,
        dim_feedforward=args.dim_feedforward,
        num_encoder_layers=args.num_encoder_layers,
        embedding_size_src=args.embedding_size_src)

    if args.all_epochs:
        return _evaluate_all_epochs(args, legacy_config)

    path = args.ckpt
    if args.epoch is not None and os.path.isdir(path):
        # select the requested epoch, not the newest (the reference's
        # load_model dict takes an explicit "epoch" the same way,
        # tutorial.py:36-68)
        matches = [f for f in sorted(os.listdir(path))
                   if f.endswith((f"_Epoch_{args.epoch}.ckpt",
                                  f"_Epoch_{args.epoch}.Model"))]
        if not matches:
            raise SystemExit(
                f"no epoch-{args.epoch} checkpoint under {path}")
        path = os.path.join(path, matches[-1])
    params, config, ckpt_epoch, loss = ckpt_mod.load_params_and_config(
        path, legacy_config=legacy_config)
    epoch = args.epoch if args.epoch is not None else ckpt_epoch

    return _evaluate(args, _bundle_for(params, config), config, epoch, loss,
                     path)


def _bundle_for(params, config):
    import jax.numpy as jnp

    from .models import build_model
    from .train.driver import ModelBundle
    from .train.loop import TrainState, make_optimizer

    model = build_model(config)
    tx = make_optimizer("sgd", 0.05)  # inert: evaluation never steps it
    state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                       opt_state=tx.init(params))
    return ModelBundle(model=model, config=config, tx=tx, state=state)


def _evaluate_all_epochs(args, legacy_config) -> int:
    """Learning curve from artifacts: one run, every saved epoch scored."""
    import re

    from .train import checkpoint as ckpt_mod
    from .utils import logging as xlog

    if not os.path.isdir(args.ckpt):
        raise SystemExit("--all_epochs needs --ckpt to be a directory")
    epochs = {}  # epoch -> filename (native .ckpt wins over legacy .Model)
    for f in sorted(os.listdir(args.ckpt)):
        m = re.search(r"_Epoch_(\d+)\.(ckpt|Model)$", f)
        if m and (int(m.group(1)) not in epochs or f.endswith(".ckpt")):
            epochs[int(m.group(1))] = f
    if not epochs:
        raise SystemExit(f"no checkpoints under {args.ckpt}")

    xlog.init(config={"checkpoint": args.ckpt, "all_epochs": sorted(epochs)},
              project="offline_eval", job_type="eval", run_dir=args.run_dir)
    args.media = "0"
    args.dump = "0"
    try:
        for epoch in sorted(epochs):
            params, config, _ep, loss = ckpt_mod.load_params_and_config(
                os.path.join(args.ckpt, epochs[epoch]),
                legacy_config=legacy_config)
            _evaluate(args, _bundle_for(params, config), config, epoch, loss,
                      os.path.join(args.ckpt, epochs[epoch]))
    finally:
        xlog.finish()
    return 0


def _evaluate(args, bundle, config, epoch, loss, path) -> int:
    from .eval.evaluator import init_evaluator, log_eval
    from .hvo import ROLAND_REDUCED_MAPPING
    from .utils import logging as xlog

    idents = list(args.identifier or [])
    media = bool(args.media) and args.media != "0" and args.media != "False"
    dump = bool(args.dump) and args.dump != "0" and args.dump != "False"
    loss_txt = "n/a" if not np.isfinite(loss) else f"{float(loss):.4f}"

    owns_run = xlog.run is None
    if owns_run:
        xlog.init(config={"checkpoint": path, "epoch": epoch},
                  project="offline_eval", job_type="eval",
                  run_dir=args.run_dir)
    try:
        for i, ev_path in enumerate(args.evaluator):
            ev = init_evaluator(ev_path, device=None)
            ev._identifier = (idents[i] if idents
                              else _default_identifier(ev_path))
            ev_dim = int(np.asarray(ev.processed_inputs).shape[-1])
            if ev_dim != config.embedding_size_src:
                raise SystemExit(
                    f"evaluator {ev_path} carries {ev_dim}-d inputs but the "
                    f"checkpoint's model takes embedding_size_src="
                    f"{config.embedding_size_src} — this evaluator belongs "
                    f"to a different experiment modality (MSO audio = 16, "
                    f"symbolic = 27)")
            log_eval(ev, bundle, log_media=media, epoch=epoch, dump=dump)
            acc = ev.get_hits_accuracies(ROLAND_REDUCED_MAPPING)
            # per-voice entries only: the family also carries an aggregate
            # "..._mean" key (eval/metrics.py)
            vals = [v for k, v in acc.items()
                    if np.isscalar(v) and not k.endswith("_mean")]
            print(f"{ev._identifier}: mean hit accuracy "
                  f"{float(np.mean(vals)):.4f} over {len(vals)} voice "
                  f"metrics (checkpoint epoch {epoch}, train loss "
                  f"{loss_txt})")
        if xlog.run is not None:  # None when the real wandb owns the run
            print(f"metrics + media written under {xlog.run.dir}")
    finally:
        if owns_run:
            xlog.finish()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
