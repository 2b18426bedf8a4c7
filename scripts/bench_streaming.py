#!/usr/bin/env python
"""Audio-modality streaming-vs-resident benchmark (docs/PERF.md).

Measures, at GMD scale (default 2 560 base loops x 4 audio augmentations =
10 240 items, flagship InfillingRandom config), the steady-state time of a
50-epoch training block in three modes:

- ``resident``: arrays stay on device, no regeneration (the lower bound);
- ``fused``: masking + on-device synth + MSO run INSIDE the compiled block
  (data/device_pipeline.py) — fresh augmentations every block, zero host work;
- ``stream``: the host StreamingAugmenter regenerates while the device trains
  (data/pipeline.py) — fresh augmentations every block, host overlapped.

"Preprocessing fully overlapped" (BASELINE.md) holds when the stream/fused
modes' block times match the resident mode's.

Usage: python scripts/bench_streaming.py [--loops 2560] [--fanout 4]
       [--blocks 3] [--modes resident fused stream]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--loops", type=int, default=2560)
    p.add_argument("--fanout", type=int, default=4)
    p.add_argument("--epochs-per-block", type=int, default=50)
    p.add_argument("--blocks", type=int, default=3)
    p.add_argument("--batch", type=int, default=512)
    p.add_argument("--modes", nargs="*",
                   default=["resident", "fused", "stream"])
    p.add_argument("--partial", type=int, default=1,
                   help="stream mode: regenerate only 1/k of the corpus per "
                        "generation (amortized rolling refresh)")
    args = p.parse_args(argv)

    import jax
    jax.config.update("jax_default_prng_impl", "unsafe_rbg")
    import jax.numpy as jnp

    from transformergrooveinfilling_tpu.data.device_pipeline import (
        make_on_device_augment)
    from transformergrooveinfilling_tpu.data.pipeline import StreamingAugmenter
    from transformergrooveinfilling_tpu.data.synthetic import (
        synthetic_gmd_sequences)
    from transformergrooveinfilling_tpu.models import build_model
    from transformergrooveinfilling_tpu.models.transformer import (
        GrooveTransformerConfig)
    from transformergrooveinfilling_tpu.train.loop import (
        create_train_state, make_epoch_fn, make_optimizer)

    n = args.loops * args.fanout
    assert n % 64 == 0, "item count must align to the synth chunk"
    print(f"corpus: {args.loops} loops x {args.fanout} aug = {n} items; "
          f"bs {args.batch}, {args.epochs_per_block}-epoch blocks "
          f"on {jax.default_backend()}", flush=True)

    seqs = synthetic_gmd_sequences(args.loops, seed=9)
    base = np.repeat(
        np.stack([s.hvo for s in seqs]).astype(np.float32),
        args.fanout, axis=0)
    qpms = np.repeat(np.asarray([s.tempos[0].qpm for s in seqs], np.float64),
                     args.fanout)

    cfg = GrooveTransformerConfig(
        d_model=256, n_heads=2, dim_feedforward=512, dropout=0.30,
        num_encoder_layers=6, max_len=32, embedding_size_src=16,
        embedding_size_tgt=27, compute_dtype=jnp.bfloat16)
    model = build_model(cfg)
    tx = make_optimizer("sgd", 0.089)

    def run_blocks(fn, state, xs, ys, fresh=None):
        key = jax.random.PRNGKey(1)
        times = []
        for b in range(args.blocks + 1):  # +1 warmup/compile block
            if fresh is not None:
                xs, ys = fresh()
                xs, ys = jnp.asarray(xs), jnp.asarray(ys)
            key, k = jax.random.split(key)
            t0 = time.perf_counter()
            state, m = fn(state, xs, ys, k)
            float(np.asarray(m["loss"]))  # forced materialization
            if b > 0:
                times.append(time.perf_counter() - t0)
        return min(times)

    results = {}
    if "resident" in args.modes:
        state = create_train_state(model, cfg, tx, jax.random.PRNGKey(0))
        fn = make_epoch_fn(model, tx, 0.73, args.batch, n, donate=False,
                           n_epochs=args.epochs_per_block)
        rng = np.random.default_rng(0)
        xs = jnp.asarray(rng.standard_normal((n, 32, 16)), jnp.float32)
        h = (rng.random((n, 32, 9)) < 0.3).astype(np.float32)
        ys = jnp.asarray(np.concatenate([h, h * 0.5, h * 0.1], 2), jnp.float32)
        results["resident"] = run_blocks(fn, state, xs, ys)
        print(f"resident arrays: {results['resident']:.1f} s/block", flush=True)

    if "fused" in args.modes:
        state = create_train_state(model, cfg, tx, jax.random.PRNGKey(0))
        augment = make_on_device_augment(qpms=qpms, mode="audio")
        fn = make_epoch_fn(model, tx, 0.73, args.batch, n, donate=False,
                           n_epochs=args.epochs_per_block, augment=augment,
                           augment_per_epoch=False)
        xs = jnp.asarray(base)
        results["fused"] = run_blocks(fn, state, xs, xs)
        print(f"fused on-device augmentation: {results['fused']:.1f} s/block",
              flush=True)

    if "stream" in args.modes:
        state = create_train_state(model, cfg, tx, jax.random.PRNGKey(0))
        fn = make_epoch_fn(model, tx, 0.73, args.batch, n, donate=False,
                           n_epochs=args.epochs_per_block)
        upd = jax.jit(
            lambda a, s, i: jax.lax.dynamic_update_slice_in_dim(a, s, i, 0),
            donate_argnums=(0,))
        dev = {}

        with StreamingAugmenter(np.stack([s.hvo for s in seqs]),
                                qpms=np.asarray(
                                    [s.tempos[0].qpm for s in seqs]),
                                aug_per_item=args.fanout, mode="audio",
                                seed=4, partial=args.partial) as streamer:
            def fresh():
                # delta consumption: only the rebuilt slab crosses the link
                sl, fi, fo = streamer.next_epoch_delta(timeout=900.0)
                if sl is None:
                    dev["x"], dev["y"] = jnp.asarray(fi), jnp.asarray(fo)
                else:
                    dev["x"] = upd(dev["x"], jnp.asarray(fi), sl.start)
                    dev["y"] = upd(dev["y"], jnp.asarray(fo), sl.start)
                return dev["x"], dev["y"]

            results["stream"] = run_blocks(fn, state, None, None, fresh=fresh)
            gen_s = streamer.last_generation_seconds
        label = (f"host streaming (partial=1/{args.partial})"
                 if args.partial > 1 else "host streaming augmentation")
        print(f"{label}: {results['stream']:.1f} s/block "
              f"(generation build {gen_s:.1f} s)", flush=True)

    return 0


if __name__ == "__main__":
    sys.exit(main())
