#!/usr/bin/env python
"""Training CLI — same surface as the reference's train.py (SURVEY.md §3.1).

Accepts the reference's YAML configs and paths.yaml verbatim (all-or-nothing
config-file-vs-CLI-args rule, --testing forcing epochs=1, the same 12
hyperparameter flags) and drives the TPU-native stack: compiled epoch loop over a
device mesh, evaluator logging, checkpointing with legacy .Model export.

Example (the de-facto integration test of the reference):
    python train.py --config=configs/InfillingClosedHH_testing_training.yaml
"""

import argparse
import os
import pprint
import sys

import yaml


def parse_args(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--paths", help="paths file", default="configs/paths.yaml")
    parser.add_argument("--testing", help="testing mode", default=False)
    parser.add_argument("--wandb", help="log to wandb", default=True)
    parser.add_argument("--eval_train", help="evaluator train set", default=True)
    parser.add_argument("--eval_test", help="evaluator test set", default=False)
    parser.add_argument("--eval_validation", help="evaluator validation set",
                        default=True)
    parser.add_argument("--only_final_eval",
                        help="only final total evaluation", default=False)
    parser.add_argument("--dump_eval", help="dump evaluator file", default=True)
    parser.add_argument("--load_model", help="load model parameters", default=None)
    parser.add_argument("--notes", help="wandb run notes", default=None)
    parser.add_argument("--tags", help="wandb run tags", default=None)
    # TPU-stack extras (absent flags keep reference defaults)
    parser.add_argument("--n_model_shards", type=int, default=1,
                        help="tensor-parallel mesh axis size")
    parser.add_argument("--pp_stages", type=int, default=1,
                        help="pipeline-parallel stages (GPipe over a "
                        "('data','pipe'[,'model']) mesh; encoder-only family; "
                        "composes with --n_model_shards for dp×pp×tp)")
    parser.add_argument("--pp_micro", type=int, default=None,
                        help="microbatches per global batch "
                        "(default 2×pp_stages; must divide batch_size)")
    parser.add_argument("--export_legacy", default=False,
                        help="also write torch-format .Model checkpoints")
    parser.add_argument("--ckpt_dir", default="checkpoints")
    parser.add_argument("--epoch_block", type=int, default=1,
                        help="epochs fused per device dispatch (scan-of-epochs)")
    parser.add_argument("--watch_log_freq", type=int, default=1000,
                        help="gradient/parameter histograms every N steps "
                             "(the reference's wandb.watch log_freq, "
                             "train.py:150); 0 disables")
    parser.add_argument("--media_async", type=int, default=1,
                        help="render eval media on a background worker so it "
                             "overlaps the next epoch block (0 = inline)")
    parser.add_argument("--max_wall_s", type=float, default=None,
                        help="wall-clock budget: stop gracefully (checkpoint + "
                        "clean exit) after the first epoch block that crosses "
                        "it; SIGTERM/SIGINT trigger the same path")
    parser.add_argument("--bf16", type=int, default=None,
                        help="matmul compute dtype: 1=bfloat16, 0=float32, "
                        "unset=auto (bf16 on TPU; docs/PERF.md)")
    parser.add_argument("--remat_policy", default=None,
                        choices=["dots", "nothing"],
                        help="selective remat when remat engages: 'dots' "
                        "stores matmul outputs and recomputes elementwise "
                        "chains (scripts/bench_backward_residual.py)")
    parser.add_argument("--remat", type=int, default=None,
                        help="encoder-layer rematerialization: 1/0 force; "
                        "absent = auto (on only when the estimated backward "
                        "residuals would overflow HBM — remat costs +26%% at "
                        "GrooveXL scale when memory does not force it)")
    parser.add_argument("--fused_ffn", type=int, default=None,
                        help="fused Pallas FFN kernel: 1=on, 0=off, unset="
                        "auto (on for TPU training at ff>=2048, +16%% at "
                        "RandomLow_lm; docs/PERF.md)")
    parser.add_argument("--fused_layer", type=int, default=None,
                        help="whole-encoder-layer fused Pallas kernel "
                        "(attention + LNs + FFN + all dropout sites, one "
                        "call per layer): 1=on, 0=off, unset=auto "
                        "(docs/PERF.md round 4)")
    parser.add_argument("--fused_decoder_layer", type=int, default=None,
                        help="whole-DECODER-layer fused Pallas kernel "
                        "(causal self-attn + cross-attn + 3 LN sites + FFN "
                        "per call; encoder-decoder family only): 1=on, "
                        "0=off, unset=auto (on at qualifying widths — "
                        "+25%% measured, docs/PERF.md round 4)")
    parser.add_argument("--fast_prng", type=int, default=1,
                        help="use the rbg PRNG for dropout masks (~2x step "
                             "time on TPU at this model size)")
    parser.add_argument("--streaming", choices=["off", "host", "fused"],
                        default="off",
                        help="fresh-augmentation training for the random-"
                             "masking experiments: host = overlapped "
                             "StreamingAugmenter generations; fused = masking"
                             "+synth+MSO inside the compiled program")
    parser.add_argument("--regen_cadence", default="auto",
                        help="host streaming: swap a fresh generation every "
                             "N epoch blocks (int), or 'auto' to fit "
                             "generation time inside the blocks it serves")
    parser.add_argument("--regen_partial", type=int, default=1,
                        help="host streaming: regenerate only 1/k of the "
                             "corpus per generation (rolling refresh)")
    parser.add_argument("--aug_per_item", type=int, default=None,
                        help="streaming: fresh augmentations per corpus item "
                             "(default: the dataset pickle's max_aug_items)")

    # hyperparameters
    parser.add_argument("--config", default=None,
                        help="yaml config file. if given, the rest of the "
                             "arguments are not taken into account")
    parser.add_argument("--experiment", help="experiment id", default=None)
    parser.add_argument("--encoder_only", default=1, type=int)
    parser.add_argument("--optimizer_algorithm", default="sgd", type=str)
    parser.add_argument("--d_model", default=64, type=int)
    parser.add_argument("--n_heads", default=16, type=int)
    parser.add_argument("--dropout", default=0.2, type=float)
    parser.add_argument("--num_encoder_decoder_layers", default=7, type=int)
    parser.add_argument("--hit_loss_penalty", default=1, type=float)
    parser.add_argument("--batch_size", default=16, type=int)
    parser.add_argument("--dim_feedforward", default=256, type=int)
    parser.add_argument("--learning_rate", default=0.05, type=float)
    parser.add_argument("--epochs", default=100, type=int)
    return parser.parse_args(argv)


def hyperparameters_from_args(args) -> dict:
    # all-or-nothing: a config file overrides every CLI hyperparameter
    if args.config is not None:
        with open(args.config) as f:
            hp = yaml.safe_load(f)
    else:
        hp = dict(
            encoder_only=args.encoder_only,
            optimizer_algorithm=args.optimizer_algorithm,
            d_model=args.d_model,
            n_heads=args.n_heads,
            dropout=args.dropout,
            num_encoder_decoder_layers=args.num_encoder_decoder_layers,
            hit_loss_penalty=args.hit_loss_penalty,
            batch_size=args.batch_size,
            dim_feedforward=args.dim_feedforward,
            learning_rate=args.learning_rate,
            epochs=args.epochs,
            load_model=args.load_model,
        )
    # CLI value is a string: a checkpoint directory → the restore dict shape
    # initialize_model expects (reference tutorial.py:36-68)
    if isinstance(hp.get("load_model"), str):
        hp["load_model"] = {"location": "local", "dir": hp["load_model"]}
    elif args.load_model is not None and not hp.get("load_model"):
        # config-file mode: the CLI flag still works when the YAML has no
        # load_model of its own
        hp["load_model"] = {"location": "local", "dir": args.load_model}
    if args.testing and args.testing != "False":
        hp["epochs"] = 1
    if args.experiment is not None:
        hp["experiment"] = args.experiment
    assert "experiment" in hp, "experiment not specified"
    return hp


def main(argv=None):
    args = parse_args(argv)
    hp_dict = hyperparameters_from_args(args)
    pprint.pprint(hp_dict)

    with open(args.paths) as f:
        paths = yaml.safe_load(f)

    os.environ["WANDB_MODE"] = "online" if args.wandb and args.wandb != "False" \
        else "offline"

    # multi-host: wire jax.distributed from the standard env vars
    # (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID, or
    # TGI_DISTRIBUTED=1 for pod auto-detection) BEFORE any backend use —
    # launching this same CLI once per host is the production scale-out path
    from transformergrooveinfilling_tpu.parallel import initialize_from_env

    if initialize_from_env():
        import jax

        if jax.process_count() > 1:
            if jax.process_index() != 0:
                # one wandb run per job, not per host; the local JSONL sink
                # still records per-process metrics under a unique run dir
                os.environ["WANDB_MODE"] = "offline"
            # in-training evaluation/media is a single-host concern (it
            # recomputes with the global params on every process but writes
            # per-process copies); run log_eval offline from checkpoints
            if any(f and f != "False" for f in (args.eval_train,
                                                args.eval_test,
                                                args.eval_validation)):
                if jax.process_index() == 0:
                    print("multi-host run: in-training evaluators disabled "
                          "(evaluate offline from checkpoints: python -m "
                          "transformergrooveinfilling_tpu.evaluate)")
                args.eval_train = args.eval_test = "False"
                args.eval_validation = "False"
                args.dump_eval = "False"

    if args.fast_prng:
        import jax
        try:
            jax.config.update("jax_default_prng_impl", "unsafe_rbg")
        except Exception:
            pass

    from transformergrooveinfilling_tpu.utils import logging as xlog

    xlog.init(config=hp_dict, project=hp_dict["experiment"], job_type="train",
              notes=args.notes, tags=args.tags)
    try:
        return _run(args, hp_dict, paths)
    finally:
        # always close the run: a failed trial must not leave the module-level
        # logging singleton active for the next caller in this process
        xlog.finish()


def _run(args, hp_dict, paths):
    from transformergrooveinfilling_tpu.data import load_processed_dataset
    from transformergrooveinfilling_tpu.eval.evaluator import init_evaluator
    from transformergrooveinfilling_tpu.parallel import make_mesh
    from transformergrooveinfilling_tpu.train.config import (
        HyperParams, embedding_size_src_for)
    from transformergrooveinfilling_tpu.train.driver import (
        initialize_model, run_training)
    from transformergrooveinfilling_tpu.utils import logging as xlog

    cfg = xlog.config  # config round-trip: sweeps override through here

    params = {
        "model": {
            "experiment": cfg.experiment,
            "encoder_only": cfg.encoder_only,
            "optimizer": cfg.optimizer_algorithm,
            "d_model": cfg.d_model,
            "n_heads": cfg.n_heads,
            "dim_feedforward": cfg.dim_feedforward,
            "dropout": cfg.dropout,
            "num_encoder_layers": cfg.num_encoder_decoder_layers,
            "num_decoder_layers": 0 if cfg.encoder_only
            else cfg.num_encoder_decoder_layers,
            "max_len": 32,
            "embedding_size_src": embedding_size_src_for(cfg.experiment),
            "embedding_size_tgt": 27,
            # TPU extra: None = auto (bf16 matmuls on TPU); CLI overrides YAML
            "bf16": (bool(args.bf16) if args.bf16 is not None
                     else cfg.get("bf16")),
            # TPU extra: None = auto (fused Pallas FFN on TPU at ff >= 2048)
            "fused_ffn": (bool(args.fused_ffn) if args.fused_ffn is not None
                          else cfg.get("fused_ffn")),
            "fused_layer": (bool(args.fused_layer)
                            if args.fused_layer is not None
                            else cfg.get("fused_layer")),
            "fused_decoder_layer": (bool(args.fused_decoder_layer)
                                    if args.fused_decoder_layer is not None
                                    else cfg.get("fused_decoder_layer")),
            # TPU extra: None = auto (remat only when HBM would overflow)
            "remat": (bool(args.remat) if args.remat is not None
                      else cfg.get("remat")),
            "remat_policy": (args.remat_policy if args.remat_policy is not None
                             else cfg.get("remat_policy")),
        },
        "training": {
            "learning_rate": cfg.learning_rate,
            "batch_size": cfg.batch_size,
            "hit_loss_penalty": cfg.hit_loss_penalty,
        },
        "load_model": cfg.get("load_model"),
    }
    xlog.config.update(params["model"])

    bundle, _tx, initial_epoch = initialize_model(params)
    xlog.watch(bundle)

    dataset_train = load_processed_dataset(
        paths[cfg.experiment]["datasets"]["train"], exp=cfg.experiment)

    evaluators = {}
    ev_paths = paths[cfg.experiment].get("evaluators", {})

    def maybe_eval(name, flag):
        if not flag or flag == "False":
            return
        path = ev_paths.get(name)
        if path and os.path.exists(path):
            evaluators[name] = init_evaluator(path, device=None)
        elif path:
            print(f"[train] evaluator pickle missing, skipping {name}: {path}",
                  file=sys.stderr)

    maybe_eval("train", args.eval_train)
    maybe_eval("test", args.eval_test)
    maybe_eval("validation", args.eval_validation)

    hp = HyperParams.from_dict(dict(cfg))
    if args.pp_stages > 1:
        from transformergrooveinfilling_tpu.parallel.pipeline import (
            make_pipeline_mesh)

        plan = make_pipeline_mesh(args.pp_stages, n_micro=args.pp_micro,
                                  n_model=args.n_model_shards)
    else:
        plan = make_mesh(n_model=args.n_model_shards)

    streamer, on_device_augment, dataset_for_training = _setup_streaming(
        args, dataset_train)
    try:
        run_training(
            hp, dataset_for_training, evaluators,
            bundle=bundle, initial_epoch=initial_epoch, plan=plan,
            only_final_eval=bool(args.only_final_eval) and
            args.only_final_eval != "False",
            dump_eval=bool(args.dump_eval) and args.dump_eval != "False",
            ckpt_dir=args.ckpt_dir,
            export_legacy=bool(args.export_legacy) and
            args.export_legacy != "False",
            epoch_block=args.epoch_block,
            streamer=streamer,
            regen_cadence=(int(args.regen_cadence)
                           if str(args.regen_cadence) != "auto" else "auto"),
            on_device_augment=on_device_augment,
            augment_per_epoch=False,  # fused mode: fresh render per block
            max_wall_s=args.max_wall_s,
            media_async=bool(args.media_async),
            watch_log_freq=args.watch_log_freq or None,
        )
    finally:
        if streamer is not None:
            streamer.close()


def _setup_streaming(args, dataset_train):
    """--streaming wiring: fresh-augmentation training for the random-masking
    experiments (VERDICT r2 directive #1 — the north-star streaming path,
    reachable from a reference YAML). Returns (streamer, on_device_augment,
    dataset_for_training)."""
    if args.streaming == "off":
        return None, None, dataset_train

    import numpy as np

    from transformergrooveinfilling_tpu.data.datasets import (
        GrooveMidiDatasetInfillingRandom)
    from transformergrooveinfilling_tpu.ops.mso import MSOParams

    if not isinstance(dataset_train, GrooveMidiDatasetInfillingRandom):
        raise SystemExit(
            "--streaming regenerates random-event maskings and applies to "
            "the InfillingRandom / InfillingRandomLow experiments; the "
            "voice-combination experiments train on their pickled "
            "augmentations (run with --streaming off)")

    base_seqs = dataset_train.hvo_sequences
    base = np.stack([s.hvo for s in base_seqs]).astype(np.float32)
    qpms = np.asarray([s.tempos[0].qpm for s in base_seqs], np.float64)

    fanout = int(args.aug_per_item or dataset_train.max_aug_items)
    mso_params = MSOParams(**dataset_train.mso_params)
    sfs = dataset_train.sfs_list or [None]
    thres = tuple(getattr(dataset_train, "thres_range", (0.4, 0.6)))

    class _ArrayDataset:  # the driver only reads the two arrays + size
        pass

    ds = _ArrayDataset()
    if args.streaming == "host":
        from transformergrooveinfilling_tpu.data.pipeline import (
            StreamingAugmenter)

        # multi-host: every process loads the same corpus; each streams
        # fresh augmentations for its own equal shard of it (run_training
        # assembles the global data-sharded array from the process-local
        # generations). Host-streaming only — the fused path's static grids
        # go through the driver's ordinary per-process dataset slicing.
        import jax

        n_proc = jax.process_count()
        if n_proc > 1:
            per = len(base) // n_proc
            if per == 0:
                raise SystemExit(
                    f"--streaming with {n_proc} processes needs a corpus of "
                    f"at least {n_proc} loops (got {len(base)})")
            if per * n_proc != len(base) and jax.process_index() == 0:
                print(f"streaming: trimming corpus {len(base)} -> "
                      f"{per * n_proc} loops ({n_proc} equal process shards)")
            pid = jax.process_index()
            base = base[pid * per:(pid + 1) * per]
            qpms = qpms[pid * per:(pid + 1) * per]

        streamer = StreamingAugmenter(
            base, qpms=qpms, aug_per_item=fanout, mode="audio",
            thres_range=thres, soundfonts=sfs, mso_params=mso_params,
            partial=args.regen_partial,
            # distinct per-process masking streams; spaced far apart because
            # generation g of a streamer draws from default_rng(seed + g) —
            # adjacent seeds would replay a neighbor's stream one swap later
            seed=jax.process_index() * (1 << 20))
        # placeholders; the driver sizes off streamer.n_samples and swaps in
        # the first generation before any use
        ds.processed_inputs = np.zeros(
            (streamer.n_samples, 32, mso_params.n_bands), np.float32)
        ds.processed_outputs = np.zeros(
            (streamer.n_samples, 32, base.shape[2]), np.float32)
        print(f"streaming(host): {len(base)} loops x {fanout} fresh "
              f"augmentations = {streamer.n_samples} items/generation, "
              f"partial=1/{args.regen_partial}, cadence={args.regen_cadence}")
        return streamer, None, ds

    # fused: clean grids ship once; masking+synth+MSO run inside the program.
    # The synth kernel maps 64-item chunks, so the fanned-out count must
    # align — repeat the corpus and trim to a multiple of 64.
    from transformergrooveinfilling_tpu.data.device_pipeline import (
        make_on_device_augment)

    grids = np.repeat(base, fanout, axis=0)
    qpms_r = np.repeat(qpms, fanout, axis=0)
    n = (len(grids) // 64) * 64
    if n == 0:
        raise SystemExit("--streaming fused needs >= 64 augmented items "
                         "(corpus x aug_per_item); use --streaming host")
    if n != len(grids):
        print(f"streaming(fused): trimming {len(grids)} -> {n} items "
              f"(64-item synth chunks)")
    ds.processed_inputs = grids[:n]
    ds.processed_outputs = grids[:n]
    augment = make_on_device_augment(
        qpms=qpms_r[:n], mode="audio", thres_range=thres, soundfonts=sfs,
        mso_params=mso_params)
    print(f"streaming(fused): {n} items re-rendered on device per block")
    return None, augment, ds


if __name__ == "__main__":
    main()
