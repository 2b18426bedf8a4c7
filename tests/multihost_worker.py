"""Worker process for the 2-process jax.distributed training test.

Launched by tests/test_multihost.py as:
    python multihost_worker.py <coordinator> <num_processes> <process_id> \
        <ckpt_dir> <out_file>

Each process: init jax.distributed (CPU backend, 2 virtual devices per
process), build the identical deterministic corpus, shard it per-process
through run_training's multi-host path, train, and write the final full-
dataset eval loss to <out_file>. Process 0 alone writes checkpoints.
"""

import json
import os
import sys


def main():
    coordinator, n_proc, pid, ckpt_dir, out_file = sys.argv[1:6]
    os.environ["TGI_PLATFORM"] = "cpu"
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"

    import jax

    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=int(n_proc),
                               process_id=int(pid))
    import numpy as np

    from transformergrooveinfilling_tpu.data.synthetic import (
        synthetic_gmd_sequences)
    from transformergrooveinfilling_tpu.parallel.multihost import global_mesh
    from transformergrooveinfilling_tpu.train.config import HyperParams
    from transformergrooveinfilling_tpu.train.driver import run_training
    from transformergrooveinfilling_tpu.train.loop import make_eval_loss_fn

    assert jax.device_count() == 2 * int(n_proc)

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
        "learning_rate": 0.1, "epochs": 3})

    plan = global_mesh()
    bundle = run_training(hp, DS(), {}, plan=plan, log_media=False,
                          ckpt_dir=ckpt_dir, seed=0, only_final_eval=True)

    # final loss on the full dataset (replicated, deterministic)
    eval_fn = make_eval_loss_fn(bundle.model, hp.hit_loss_penalty)
    params_host = jax.tree.map(np.asarray, jax.device_get(bundle.state.params))
    # re-evaluate single-device on host-fetched params: identical across procs
    import jax.numpy as jnp
    with jax.default_device(jax.local_devices()[0]):
        loss = float(eval_fn(jax.tree.map(jnp.asarray, params_host),
                             jnp.asarray(x), jnp.asarray(hvos))["loss"])
    with open(out_file, "w") as f:
        json.dump({"process": int(pid), "loss": loss,
                   "n_ckpts": len([f for f in os.listdir(ckpt_dir)])
                   if os.path.isdir(ckpt_dir) else 0}, f)


if __name__ == "__main__":
    main()
