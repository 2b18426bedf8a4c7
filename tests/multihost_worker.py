"""Worker process for the jax.distributed training tests.

Launched by tests/test_multihost.py as:
    python multihost_worker.py <coordinator> <num_processes> <process_id> \
        <ckpt_dir> <out_file> [--n_model N] [--epochs E] [--resume]

Each process: init jax.distributed (CPU backend, 2 virtual devices per
process), build the identical deterministic corpus, shard it per-process
through run_training's multi-host path (dp-only or dp×tp via --n_model),
train, and write the final full-dataset eval loss to <out_file>. Process 0
alone writes checkpoints. --resume restores the newest checkpoint in
<ckpt_dir> before training (the multi-host checkpoint-resume leg).
"""

import argparse
import json
import os


def main():
    p = argparse.ArgumentParser()
    p.add_argument("coordinator")
    p.add_argument("n_proc", type=int)
    p.add_argument("pid", type=int)
    p.add_argument("ckpt_dir")
    p.add_argument("out_file")
    p.add_argument("--n_model", type=int, default=1)
    p.add_argument("--epochs", type=int, default=3)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--streaming", action="store_true")
    p.add_argument("--fused", action="store_true")
    p.add_argument("--dp_shard", action="store_true")
    args = p.parse_args()

    os.environ["TGI_PLATFORM"] = "cpu"
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"

    import jax

    # the shutdown barrier opens when the FIRST process exits; on a 1-core
    # host n_proc time-sliced workers can finish >300 s (the default) apart,
    # and a barrier timeout kills the laggards MID-RUN (fatal coordination
    # error), losing their results. Give the spread room instead.
    jax.distributed.initialize(coordinator_address=args.coordinator,
                               num_processes=args.n_proc,
                               process_id=args.pid,
                               initialization_timeout=600,
                               shutdown_timeout_seconds=1200)
    import numpy as np

    from transformergrooveinfilling_tpu.data.synthetic import (
        synthetic_gmd_sequences)
    from transformergrooveinfilling_tpu.parallel.multihost import global_mesh
    from transformergrooveinfilling_tpu.train.config import HyperParams
    from transformergrooveinfilling_tpu.train.driver import (
        initialize_model, run_training)
    from transformergrooveinfilling_tpu.train.loop import make_eval_loss_fn

    assert jax.device_count() == 2 * args.n_proc

    seqs = synthetic_gmd_sequences(32, seed=77)
    hvos = np.stack([s.hvo for s in seqs]).astype(np.float32)
    x = hvos.copy()
    x[:, :, [2, 11, 20]] = 0.0  # mask closed hats

    class DS:
        processed_inputs = x
        processed_outputs = hvos

    hp = HyperParams.from_dict({
        "experiment": "InfillingClosedHH_Symbolic", "encoder_only": 1,
        "optimizer_algorithm": "sgd", "d_model": 16, "n_heads": 2,
        "dropout": 0.0, "num_encoder_decoder_layers": 1,
        "hit_loss_penalty": 0.5, "batch_size": 8, "dim_feedforward": 16,
        "learning_rate": 0.1, "epochs": args.epochs,
        # --dp_shard: force fused_layer so the driver routes through the
        # shard_map dp step (train/loop.py::_make_dp_shard_step) across
        # REAL jax.distributed processes. At d16 the kernel's width gate
        # rejects inside the layer (rate-0-identical unfused math), so this
        # leg validates the cross-process shard_map step machinery itself.
        "fused_layer": 1 if args.dp_shard else None})

    plan = global_mesh(n_model=args.n_model)

    bundle = None
    initial_epoch = 0
    if args.resume:
        # every process restores the same file host-side; the driver then
        # assembles the global (replicated / tp-sharded) arrays from it
        params = {
            "model": {"d_model": 16, "n_heads": 2, "dim_feedforward": 16,
                      "dropout": 0.0, "num_encoder_layers": 1,
                      "embedding_size_src": 27, "optimizer": "sgd"},
            "training": {"learning_rate": 0.1, "seed": 0},
            "load_model": {"location": "local", "dir": args.ckpt_dir},
        }
        bundle, _tx, initial_epoch = initialize_model(params)

    streamer = None
    ds = DS()
    run_kwargs = {}
    if args.fused:
        # fused augmentation under multi-host: the clean grids ride the
        # ordinary per-process dataset sharding; fresh random maskings are
        # generated INSIDE the compiled (GSPMD-partitioned) epoch program
        from transformergrooveinfilling_tpu.data.device_pipeline import (
            make_on_device_augment)

        class FDS:
            processed_inputs = hvos
            processed_outputs = hvos

        ds = FDS()
        run_kwargs = dict(
            on_device_augment=make_on_device_augment(mode="symbolic"),
            augment_per_epoch=True)
    elif args.streaming:
        # multi-host streaming: each process streams fresh random-masking
        # augmentations for its own equal shard of the corpus; run_training
        # assembles each generation into the global data-sharded array
        from transformergrooveinfilling_tpu.data.pipeline import (
            StreamingAugmenter)

        per = len(hvos) // args.n_proc
        shard = hvos[args.pid * per:(args.pid + 1) * per]
        # seeds spaced >> generation count: generation g draws from
        # default_rng(seed + g), so adjacent per-process seeds would replay
        # a neighbor's masking stream one swap later
        streamer = StreamingAugmenter(shard, aug_per_item=2, mode="symbolic",
                                      seed=args.pid * (1 << 20), partial=2)

        class SDS:
            processed_inputs = np.zeros((streamer.n_samples, 32, 27),
                                        np.float32)
            processed_outputs = np.zeros((streamer.n_samples, 32, 27),
                                         np.float32)

        ds = SDS()
        # "auto" exercises the collective cadence agreement (allgather of
        # the per-host want) under real jax.distributed
        run_kwargs = dict(streamer=streamer, regen_cadence="auto")

    try:
        bundle = run_training(hp, ds, {}, plan=plan, bundle=bundle,
                              initial_epoch=initial_epoch, log_media=False,
                              ckpt_dir=args.ckpt_dir, seed=0,
                              only_final_eval=True, **run_kwargs)
    finally:
        if streamer is not None:
            streamer.close()

    # final loss on the full dataset (replicated, deterministic)
    eval_fn = make_eval_loss_fn(bundle.model, hp.hit_loss_penalty)
    from transformergrooveinfilling_tpu.train import checkpoint as ckpt_mod

    params_host = ckpt_mod.fetch_state_to_host(bundle.state)["params"]
    # re-evaluate single-device on host-fetched params: identical across procs
    import jax.numpy as jnp
    with jax.default_device(jax.local_devices()[0]):
        loss = float(eval_fn(jax.tree.map(jnp.asarray, params_host),
                             jnp.asarray(x), jnp.asarray(hvos))["loss"])
    with open(args.out_file, "w") as f:
        json.dump({"process": args.pid, "loss": loss,
                   "initial_epoch": initial_epoch,
                   "n_ckpts": len([f for f in os.listdir(args.ckpt_dir)])
                   if os.path.isdir(args.ckpt_dir) else 0}, f)


if __name__ == "__main__":
    main()
