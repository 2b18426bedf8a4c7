#!/usr/bin/env python
"""A/B train the flagship audio config under both MSO compression laws.

VERDICT r2 directive #4: the round-1 MSO re-derivation compresses band
energies with ``log1p(10·E)`` while the reference's librosa pipeline applies
power-dB (``10·log10(E²/peak)``, top_db 80). The loop oracle quantified the
numerical gap (identical onset steps, ≥90 % cell agreement, 0.74 rank
correlation) but not which law *trains* better. This script closes the
question with data: identical corpus, masks, model init, and schedule —
only the compression differs — then compares validation loss / hit accuracy
/ velocity + offset MSE. The winner is MSOParams' default; the measured
delta lives in PARITY.md.

Usage: python scripts/compare_mso_compression.py [--loops 768] [--fanout 4]
       [--epochs 300] [--out /tmp/mso_ab.json]
"""

import argparse
import dataclasses
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--loops", type=int, default=768)
    p.add_argument("--fanout", type=int, default=4)
    p.add_argument("--epochs", type=int, default=300)
    p.add_argument("--epoch-block", type=int, default=50)
    p.add_argument("--val-frac", type=float, default=0.25)
    p.add_argument("--out", default=None)
    p.add_argument("--seed", type=int, default=0,
                   help="varies corpus/mask/model-init seeds together "
                        "(multi-seed replication of the study)")
    p.add_argument("--laws", nargs="*", default=["log1p", "db"],
                   help="run a subset of arms (one per process keeps runs "
                        "inside tight wall-clock budgets; results merge "
                        "into --out if it already exists)")
    args = p.parse_args(argv)

    import jax
    jax.config.update("jax_default_prng_impl", "unsafe_rbg")
    import jax.numpy as jnp
    import yaml

    from transformergrooveinfilling_tpu.data.synthetic import (
        synthetic_gmd_sequences)
    from transformergrooveinfilling_tpu.hvo import N_VOICES
    from transformergrooveinfilling_tpu.models import build_model
    from transformergrooveinfilling_tpu.models.transformer import (
        GrooveTransformerConfig)
    from transformergrooveinfilling_tpu.ops.mso import (
        MSOParams, mso_batch_from_hvo)
    from transformergrooveinfilling_tpu.train.loop import (
        create_train_state, make_epoch_fn, make_eval_loss_fn, make_optimizer)

    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "configs",
            "InfillingRandom_training.yaml")) as f:
        y = yaml.safe_load(f)

    # corpus + one fixed set of maskings shared by both arms
    seqs = synthetic_gmd_sequences(args.loops, seed=11 + args.seed)
    base = np.stack([s.hvo for s in seqs]).astype(np.float32)
    qpms = np.asarray([s.tempos[0].qpm for s in seqs], np.float64)
    stacked = np.repeat(base, args.fanout, axis=0)
    qpms_r = np.repeat(qpms, args.fanout)
    rng = np.random.default_rng(5 + args.seed)
    thres = rng.uniform(0.4, 0.6, (len(stacked), 1, 1))
    h = stacked[:, :, :N_VOICES]
    remove = (rng.random(h.shape) < thres) & (h > 0)
    remove3 = np.concatenate([remove] * 3, axis=2)
    kept = np.where(remove3, 0.0, stacked)
    removed = np.where(remove3, stacked, 0.0)

    n_val = int(len(stacked) * args.val_frac)
    n_train = len(stacked) - n_val
    print(f"{args.loops} loops x {args.fanout} = {len(stacked)} items "
          f"({n_train} train / {n_val} val); flagship config "
          f"d{y['d_model']}/ff{y['dim_feedforward']}/"
          f"{y['num_encoder_decoder_layers']}L bs{y['batch_size']}, "
          f"{args.epochs} epochs on {jax.default_backend()}", flush=True)

    cfg = GrooveTransformerConfig(
        d_model=y["d_model"], n_heads=y["n_heads"],
        dim_feedforward=y["dim_feedforward"], dropout=y["dropout"],
        num_encoder_layers=y["num_encoder_decoder_layers"], max_len=32,
        embedding_size_src=16, embedding_size_tgt=27,
        compute_dtype=jnp.bfloat16 if jax.default_backend() == "tpu"
        else jnp.float32)
    model = build_model(cfg)

    results = {}
    if args.out and os.path.exists(args.out):
        with open(args.out) as f:
            results = json.load(f).get("results", {})
    for compression in args.laws:
        params = MSOParams(compression=compression)
        t0 = time.time()
        inputs = mso_batch_from_hvo(kept, [None] * len(kept), qpms_r,
                                    params=params)
        t_mso = time.time() - t0
        x_tr = jnp.asarray(inputs[:n_train])
        y_tr = jnp.asarray(removed[:n_train])
        x_va = jnp.asarray(inputs[n_train:])
        y_va = jnp.asarray(removed[n_train:])

        tx = make_optimizer(y.get("optimizer_algorithm", "sgd"),
                            y["learning_rate"])
        state = create_train_state(model, cfg, tx,
                                   jax.random.PRNGKey(args.seed))
        epoch_fn = make_epoch_fn(model, tx, y["hit_loss_penalty"],
                                 y["batch_size"], n_train, donate=True,
                                 n_epochs=args.epoch_block)
        eval_fn = make_eval_loss_fn(model, y["hit_loss_penalty"])
        key = jax.random.PRNGKey(1 + args.seed)
        t0 = time.time()
        done = 0
        while done < args.epochs:
            blk = min(args.epoch_block, args.epochs - done)
            if blk != args.epoch_block:
                epoch_fn = make_epoch_fn(
                    model, tx, y["hit_loss_penalty"], y["batch_size"],
                    n_train, donate=True, n_epochs=blk)
            key, k = jax.random.split(key)
            state, m = epoch_fn(state, x_tr, y_tr, k)
            done += blk
        train_loss = float(np.asarray(m["loss"]))
        t_train = time.time() - t0
        val = {k2: float(v) for k2, v in
               eval_fn(state.params, x_va, y_va).items()}
        results[compression] = {
            "train_loss": round(train_loss, 5),
            "val_loss": round(val["loss"], 5),
            "val_hit_accuracy": round(val["hit_accuracy"], 5),
            "val_mse_velocities": round(val["mse_velocities"], 6),
            "val_mse_offsets": round(val["mse_offsets"], 6),
            "mso_build_s": round(t_mso, 1),
            "train_s": round(t_train, 1),
        }
        print(f"{compression}: {json.dumps(results[compression])}",
              flush=True)

    summary = {}
    if "db" in results and "log1p" in results:
        d = results["db"]
        l_ = results["log1p"]
        summary = {
            "winner_by_val_loss": "db" if d["val_loss"] < l_["val_loss"]
            else "log1p",
            "val_loss_delta_db_minus_log1p": round(
                d["val_loss"] - l_["val_loss"], 6),
            "val_hit_acc_delta_db_minus_log1p": round(
                d["val_hit_accuracy"] - l_["val_hit_accuracy"], 6),
        }
    print(json.dumps({"results": results, "summary": summary}))
    if args.out:
        with open(args.out, "w") as f:
            json.dump({"results": results, "summary": summary}, f, indent=2)
    return 0


if __name__ == "__main__":
    sys.exit(main())
