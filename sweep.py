#!/usr/bin/env python
"""Hyperparameter sweep runner.

The reference scales out via wandb random-search sweeps (configs/*_sweep.yaml,
SURVEY.md §2.4) with a cloud-side agent. This runner executes the same sweep
YAML schema locally: sample N configs from the declared distributions, run each
through the training driver, and rank by the sweep metric read back from the
run's metrics sink. With wandb installed + online, prefer `wandb sweep` — the
YAML is compatible by construction.

Usage: python sweep.py --sweep configs/InfillingClosedHH_sweep.yaml --count 8
"""

import argparse
import glob
import json
import os
import random
import sys

import yaml


def sample_param(spec, rng: random.Random):
    if "value" in spec:
        return spec["value"]
    if "values" in spec:
        return rng.choice(spec["values"])
    dist = spec.get("distribution")
    if dist == "uniform":
        return rng.uniform(spec["min"], spec["max"])
    if dist == "int_uniform":
        return rng.randint(spec["min"], spec["max"])
    if dist == "log_uniform":
        import math
        return math.exp(rng.uniform(spec["min"], spec["max"]))
    raise ValueError(f"unsupported distribution spec: {spec}")


def sample_config(sweep: dict, rng: random.Random) -> dict:
    return {name: sample_param(spec, rng)
            for name, spec in sweep["parameters"].items()}


def read_final_metric(project: str, metric: str):
    """Latest run's last logged value of `metric` from the local JSONL sink."""
    run_dirs = sorted(glob.glob(os.path.join("runs", project, "*")))
    if not run_dirs:
        return None
    path = os.path.join(run_dirs[-1], "metrics.jsonl")
    value = None
    if os.path.exists(path):
        with open(path) as f:
            for line in f:
                rec = json.loads(line)
                if metric in rec:
                    value = rec[metric]
    return value


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--sweep", required=True, help="sweep yaml")
    parser.add_argument("--count", type=int, default=4)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--paths", default="configs/paths.yaml")
    parser.add_argument("--epochs", type=int, default=None,
                        help="override epochs per trial (quick sweeps)")
    parser.add_argument("--batched", action="store_true",
                        help="vmap-batched trials: trials are grouped by "
                             "architecture (every sampled parameter except "
                             "learning_rate/hit_loss_penalty) and each group "
                             "runs as ONE compiled program (sgd and adam)")
    args = parser.parse_args(argv)

    with open(args.sweep) as f:
        sweep = yaml.safe_load(f)
    metric = sweep.get("metric", {}).get("name", "loss")
    goal = sweep.get("metric", {}).get("goal", "minimize")
    project = sweep.get("project", "sweep")
    rng = random.Random(args.seed)

    # one up-front sample so both modes see the identical search draw
    trials = []
    for _ in range(args.count):
        hp = sample_config(sweep, rng)
        if args.epochs is not None:
            hp["epochs"] = args.epochs
        trials.append(hp)

    if args.batched:
        return run_batched(trials, metric, goal, project, args)
    return run_sequential(trials, metric, goal, project, args)


def run_trial_sequential(hp: dict, project: str, metric: str, args):
    """One trial through the full training driver; → metric value or None."""
    import train as train_cli

    hp = dict(hp)
    # only_final_eval is a driver flag, not a model hyperparameter
    only_final = bool(hp.pop("only_final_eval", 1))
    # a validation-referencing sweep metric needs the validation evaluator
    # loaded, or the trial can never log it and would always score None
    needs_val = "validation" in metric
    cli = ["--paths", args.paths, "--wandb", "False",
           "--eval_train", "False",
           "--eval_validation", "True" if needs_val else "False",
           "--dump_eval", "False",
           "--only_final_eval", "True" if only_final else "False"]
    for key, val in hp.items():
        cli += [f"--{key}", str(val)]
    try:
        train_cli.main(cli)
        return read_final_metric(project, metric)
    except Exception as e:
        print(f"    trial failed: {e}")
        return None


def run_sequential(trials, metric: str, goal: str, project: str, args) -> int:
    results = []
    for i, hp in enumerate(trials):
        print(f"--- trial {i}: {hp}")
        value = run_trial_sequential(hp, project, metric, args)
        results.append((value, hp))
        print(f"    {metric} = {value}")

    scored = [(v, hp) for v, hp in results if v is not None]
    if scored:
        best = (min if goal == "minimize" else max)(scored, key=lambda r: r[0])
        print(f"\nbest {metric} = {best[0]}\nbest config: "
              f"{json.dumps(best[1], indent=2, default=str)}")
        return 0
    print("no successful trials")
    return 1


# parameters that ride the batched vmap as per-trial data rather than
# forcing separate compiled programs (dropout enters as the 8-bit mask
# threshold, ops/dropout.py — the reference sweep YAMLs sample it
# continuously, which would otherwise make every trial a singleton group)
_PER_TRIAL_KEYS = ("learning_rate", "hit_loss_penalty", "dropout")


def run_batched(trials, metric: str, goal: str, project: str, args) -> int:
    """vmap-batched trials, honoring architecture-varying sweeps.

    The reference sweep YAMLs sample d_model/dim_feedforward/n_heads/layers
    per trial (configs/*_sweep.yaml) — those can't share one compiled
    program. Trials are therefore grouped by their full sampled config minus
    the per-trial scalars (learning_rate, hit_loss_penalty, dropout — the
    continuous parameters, which ride the vmap as data); each group runs
    as one vmap program (train/vmap_sweep.py), singleton groups included, so
    the sampled search space is exactly the sequential mode's.

    Sweeps batched mode can't rank (a non-loss metric or maximize goal) and
    groups it can't train (optimizers beyond sgd/adam) **fall back to sequential
    execution** with a note — every sweep YAML runs to a ranking either way.
    """
    import numpy as np

    if goal != "minimize" or metric != "loss":
        # batched mode ranks on the deterministic full-TRAIN-set loss; any
        # other metric (validation_loss included) needs the full driver
        print(f"note: --batched ranks on eval loss (minimize); this sweep's "
              f"metric {metric!r} (goal {goal}) needs the full driver — "
              "falling back to sequential trials")
        return run_sequential(trials, metric, goal, project, args)

    from transformergrooveinfilling_tpu.data import load_processed_dataset
    from transformergrooveinfilling_tpu.models import build_model
    from transformergrooveinfilling_tpu.train.config import (
        HyperParams, derive_model_config)
    from transformergrooveinfilling_tpu.train.vmap_sweep import batched_sweep

    trials = [{k: v for k, v in t.items() if k != "only_final_eval"}
              for t in trials]
    groups: dict = {}
    for i, cfg in enumerate(trials):
        key = tuple(sorted((k, v) for k, v in cfg.items()
                           if k not in _PER_TRIAL_KEYS))
        groups.setdefault(key, []).append(i)

    import yaml as _yaml
    with open(args.paths) as f:
        paths = _yaml.safe_load(f)
    ds_cache: dict = {}
    losses_by_trial = [None] * len(trials)
    fallback_trials: list = []

    print(f"batched sweep: {len(trials)} trials in {len(groups)} "
          f"architecture group(s), one compiled program per group")
    for gi, (key, idxs) in enumerate(groups.items()):
        base = {k: v for k, v in trials[idxs[0]].items()
                if k not in _PER_TRIAL_KEYS}
        hp = HyperParams.from_dict(base)
        if hp.optimizer_algorithm not in ("sgd", "adam"):
            # an optimizer the vmapped step has no data-lr update rule for —
            # run these trials through the sequential driver instead (the
            # logged final loss is the same quantity this mode ranks on)
            print(f"--- group {gi}: optimizer "
                  f"{hp.optimizer_algorithm!r} can't batch; running its "
                  f"{len(idxs)} trial(s) sequentially")
            for i in idxs:
                losses_by_trial[i] = run_trial_sequential(
                    trials[i], project, metric, args)
            fallback_trials.extend(idxs)
            continue
        config = derive_model_config(hp)
        if ((config.fused_layer and getattr(hp, "fused_layer", None) is None)
                or (config.fused_decoder_layer
                    and getattr(hp, "fused_decoder_layer", None) is None)):
            # the batched sweep vmaps the whole train step over K stacked
            # trials; the whole-layer Pallas kernels are only validated
            # un-vmapped (their per-tile PRNG seeding assumes the row grid
            # IS the batch), so auto keeps both off here
            import dataclasses as _dc

            config = _dc.replace(
                config,
                fused_layer=(False if getattr(hp, "fused_layer", None) is None
                             else config.fused_layer),
                fused_decoder_layer=(
                    False if getattr(hp, "fused_decoder_layer", None) is None
                    else config.fused_decoder_layer))
        if getattr(hp, "remat", None) is None:
            # the auto-remat estimate must see the BATCHED picture: K stacked
            # trials of params/optimizer state/batch share ONE device (vmap,
            # no mesh), not the per-device share of a dp run
            import dataclasses as _dc

            from transformergrooveinfilling_tpu.train.config import (
                resolve_remat)

            config = _dc.replace(config, remat=resolve_remat(
                None, d_model=hp.d_model, n_heads=hp.n_heads,
                dim_feedforward=hp.dim_feedforward,
                n_layers=hp.num_encoder_decoder_layers,
                n_decoder_layers=config.num_decoder_layers,
                optimizer=hp.optimizer_algorithm,
                batch_size=hp.batch_size, n_data_shards=1,
                n_replicas=len(idxs)))
        model = build_model(config)
        lrs = [float(trials[i].get("learning_rate", 0.05)) for i in idxs]
        pens = [float(trials[i].get("hit_loss_penalty", 1.0)) for i in idxs]
        rates = [float(trials[i].get("dropout", hp.dropout)) for i in idxs]
        if hp.experiment not in ds_cache:
            ds_cache[hp.experiment] = load_processed_dataset(
                paths[hp.experiment]["datasets"]["train"], exp=hp.experiment)
        ds = ds_cache[hp.experiment]
        print(f"--- group {gi}: {len(idxs)} trial(s) of "
              f"d{hp.d_model}/ff{hp.dim_feedforward}/"
              f"{hp.num_encoder_decoder_layers}L bs{hp.batch_size} "
              f"x {hp.epochs} epochs")
        x = np.asarray(ds.processed_inputs, np.float32)
        y = np.asarray(ds.processed_outputs, np.float32)
        params, _last_batch_losses = batched_sweep(
            model, config, x, y, lrs, pens, rates=rates,
            epochs=hp.epochs, batch_size=hp.batch_size,
            seed=args.seed + gi, optimizer=hp.optimizer_algorithm)
        # rank on the deterministic full-dataset loss, not the last training
        # batch (matches the sequential runner's logged-loss semantics)
        from transformergrooveinfilling_tpu.train.vmap_sweep import (
            stacked_eval_loss)
        losses = stacked_eval_loss(model, params, x, y, pens,
                                   encoder_only=config.encoder_only)
        for i, loss in zip(idxs, np.asarray(losses)):
            losses_by_trial[i] = float(loss)

    scored = [i for i, v in enumerate(losses_by_trial) if v is not None]
    if not scored:
        print("no successful trials")
        return 1
    if 0 < len(fallback_trials) < len(scored):
        print("note: ranking mixes the batched groups' deterministic "
              "full-dataset eval loss with the sequential fallbacks' "
              "last-logged training loss — compare across the two kinds "
              "with care")
    order = sorted(scored, key=lambda i: losses_by_trial[i])
    for i in order[:5]:
        cfg = trials[i]
        print(f"  loss {losses_by_trial[i]:.4f}  "
              f"lr {cfg.get('learning_rate', 0.05):.4f}  "
              f"hit_loss_penalty {cfg.get('hit_loss_penalty', 1.0):.3f}  "
              f"d{cfg.get('d_model')}/ff{cfg.get('dim_feedforward')}/"
              f"{cfg.get('num_encoder_decoder_layers')}L")
    print("note: raw loss is not comparable across hit_loss_penalty values "
          "(the penalty scales the loss); prefer a fixed penalty or rank by "
          "a penalty-independent metric")
    return 0


if __name__ == "__main__":
    sys.exit(main())
