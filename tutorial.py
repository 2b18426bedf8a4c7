#!/usr/bin/env python
"""Walkthrough of the framework's load paths (reference tutorial.py equivalent).

Covers, end to end, on a tiny synthetic corpus:
1. building + reloading a processed dataset pickle,
2. building + reloading a preprocessed evaluator pickle,
3. initializing a model and resuming from a local checkpoint directory
   (including a reference-era torch ``.Model`` if one is present),
4. running prediction + the metric suite,
5. serving an infill through the compiled low-latency path.

Run:  TGI_PLATFORM=cpu python tutorial.py
"""

import os
import tempfile

import numpy as np

from transformergrooveinfilling_tpu.data import (
    GrooveMidiDatasetInfillingSymbolic,
    load_processed_dataset,
    synthetic_gmd_sequences,
)
from transformergrooveinfilling_tpu.eval.evaluator import (
    InfillingEvaluator,
    init_evaluator,
)
from transformergrooveinfilling_tpu.train import checkpoint as ckpt
from transformergrooveinfilling_tpu.train.driver import initialize_model

work = tempfile.mkdtemp(prefix="tgi_tutorial_")
print(f"working dir: {work}")

# -- 1. dataset ---------------------------------------------------------------
print("\n[1] building the symbolic ClosedHH dataset from a synthetic corpus...")
corpus = synthetic_gmd_sequences(30, seed=1)
dataset = GrooveMidiDatasetInfillingSymbolic(
    data=corpus,
    dataset_name="TutorialDS", split="train",
    save_dataset_path=os.path.join(work, "ds"),
    voices_params={"voice_idx": [2], "min_n_voices_to_remove": 1,
                   "max_n_voices_to_remove": 1, "prob": [1], "k": 5},
    max_aug_items=2, seed=7)
print(f"    {len(dataset)} (input, target, idx) items; "
      f"input shape {dataset[0][0].shape}")

reloaded = load_processed_dataset(dataset.save_dataset_path,
                                  exp="InfillingClosedHH_Symbolic")
print(f"    reloaded from pickle: {len(reloaded)} items")

# -- 2. evaluator -------------------------------------------------------------
print("\n[2] building + pickling the evaluator...")
evaluator = InfillingEvaluator(
    _identifier="Train_Set", n_samples_to_use=64,
    n_samples_to_synthesize_visualize_per_subset=2,
    dataset=reloaded, sequences=corpus, horizontal=True)
ev_path = evaluator.save_as_pickle(os.path.join(work, "evaluators"))
evaluator = init_evaluator(ev_path, device=None)
print(f"    styles: {evaluator._gt_tags}")

# -- 3. model + checkpoint resume --------------------------------------------
print("\n[3] initializing the model (and saving/resuming a checkpoint)...")
params = {
    "model": {"experiment": "InfillingClosedHH_Symbolic", "encoder_only": 1,
              "optimizer": "sgd", "d_model": 32, "n_heads": 4,
              "dim_feedforward": 16, "dropout": 0.18, "num_encoder_layers": 6,
              "num_decoder_layers": 0, "max_len": 32,
              "embedding_size_src": 27, "embedding_size_tgt": 27},
    "training": {"learning_rate": 0.094, "batch_size": 32,
                 "hit_loss_penalty": 0.47},
    "load_model": None,
}
bundle, _opt, initial_epoch = initialize_model(params)
ckpt_dir = os.path.join(work, "checkpoints")
ckpt.save_checkpoint(ckpt_dir, "tutorial", 0, bundle.state, 9.9, bundle.config)

params["load_model"] = {"location": "local", "dir": ckpt_dir}
bundle, _opt, initial_epoch = initialize_model(params)
print(f"    resumed at epoch {initial_epoch}")

# this repo ships its own demo checkpoints (native + torch formats); the
# model params must match the checkpoint's architecture (Adam, ff=512 — the
# retrained symbolic demo), exactly as the reference requires its params dict
# to match a restored .Model
own_demo = os.path.join(os.path.dirname(os.path.abspath(__file__)), "demo")
if os.path.isdir(own_demo):
    params_demo = dict(params)
    params_demo["model"] = dict(params["model"], optimizer="adam",
                                dim_feedforward=512, dropout=0.1)
    params_demo["training"] = dict(params["training"], learning_rate=3e-4)
    params_demo["load_model"] = {"location": "local", "dir": own_demo}
    demo_bundle, _o, ep = initialize_model(params_demo)
    print(f"    in-repo demo checkpoint resumed at epoch {ep}")

# legacy torch checkpoints load the same way:
demo = "/root/reference/demo/transformer_run_171tyqit_Epoch_1.Model"
if os.path.exists(demo):
    import shutil
    legacy_dir = os.path.join(work, "legacy")
    os.makedirs(legacy_dir)
    shutil.copy(demo, legacy_dir)
    params_legacy = dict(params)
    params_legacy["model"] = dict(params["model"], embedding_size_src=16)
    params_legacy["load_model"] = {
        "location": "local", "dir": legacy_dir,
        "file_pattern": "transformer_run_{}_Epoch_{}.Model"}
    legacy_bundle, _o, ep = initialize_model(params_legacy)
    print(f"    reference .Model checkpoint resumed at epoch {ep}")

# -- 4. prediction + metrics --------------------------------------------------
print("\n[4] prediction + metric suite...")
from transformergrooveinfilling_tpu.eval.evaluator import ROLAND_REDUCED_MAPPING

evaluator.set_pred(bundle)
acc = evaluator.get_hits_accuracies(ROLAND_REDUCED_MAPPING)
print(f"    mean hit accuracy (untrained): "
      f"{acc['Train_Set_Hits_Accuracy_mean']:.3f}")

# -- 5. serving ---------------------------------------------------------------
print("\n[5] compiled low-latency serving...")
from transformergrooveinfilling_tpu.serve import InfillServer

server = InfillServer(bundle.state.params, bundle.config, batch_sizes=(1,),
                      use_pallas=False)
out = server.infill(np.asarray(dataset[0][0]))
print(f"    infill output {out.shape}; "
      f"p50 so far {server.stats.percentile(50):.2f} ms")

# -- 6. scale-out -------------------------------------------------------------
# Matmul dtype: on TPU backends the models train with true bf16 MXU matmuls
# by default (bf16: hyperparameter / --bf16 flag; docs/PERF.md "promotion
# trap"). This process's resolved dtype:
from transformergrooveinfilling_tpu.train.config import resolve_compute_dtype

print(f"\n[6] scale-out: matmul dtype here = "
      f"{resolve_compute_dtype(None).__name__}")

# Pipeline parallelism for deep configs: a ("data", "pipe") mesh splits the
# encoder stack across devices (GPipe microbatch schedule, parallel/pipeline.py).
# Runs when >= 4 devices are visible (e.g. the 8-virtual-device CPU test mesh).
import jax

if jax.device_count() >= 4:
    from transformergrooveinfilling_tpu.parallel import (
        make_pipeline_mesh, pipeline_forward)

    plan = make_pipeline_mesh(n_stages=2, n_data=2, n_micro=2)
    deep_cfg = bundle.config
    if deep_cfg.num_encoder_layers % 2 == 0:
        x0 = np.asarray(dataset[0][0], np.float32)[None].repeat(4, axis=0)
        h_, v_, o_ = jax.jit(
            lambda p, v: pipeline_forward(p, v, plan, deep_cfg))(
            bundle.state.params, x0)
        print(f"    pipelined forward over data=2 x pipe=2: {h_.shape}")
else:
    print("    (pipeline demo needs >= 4 devices; run under "
          "XLA_FLAGS=--xla_force_host_platform_device_count=8)")
# -- 7. deployment: portable serving artifacts --------------------------------
# A checkpoint's serving predict exports to ONE multi-platform StableHLO
# artifact (jax.export) that loads and runs with no model code at all —
# export on this host, serve the same file on a TPU chip (export.py).
from transformergrooveinfilling_tpu.export import export_infill, load_infill

art = os.path.join(tempfile.mkdtemp(), "tutorial.tgix")
export_infill(bundle.state.params, bundle.config, art, batch_sizes=(1, 4))
loaded = load_infill(art)
pred = loaded.predict(np.asarray(dataset[0][0], np.float32))
print(f"\n[7] exported artifact: {os.path.getsize(art)/1e6:.1f} MB, "
      f"buckets {loaded.batch_sizes}, predict -> {pred.shape}")

# -- 8. offline evaluation ------------------------------------------------------
# Any past checkpoint (or artifact) re-scores outside training: the identical
# in-training log_eval pass from saved artifacts (evaluate.py). This is also
# how multi-host CLI runs evaluate (train.py auto-disables in-training
# evaluators across processes).
print("\n[8] offline evaluation of the saved checkpoint...")
from transformergrooveinfilling_tpu import evaluate as evaluate_cli

evaluate_cli.main(["--ckpt", ckpt_dir, "--evaluator", ev_path,
                   "--media", "0", "--run_dir", os.path.join(work, "eval")])

print("\ntutorial complete.")
