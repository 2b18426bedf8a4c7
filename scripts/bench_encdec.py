#!/usr/bin/env python
"""Encoder-decoder (encoder_only=0) production-size training throughput.

The reference exposes the full enc-dec family (train.py:125-127) but all its
shipped configs train encoder-only; docs/PERF.md's tables were
encoder-only too. This measures the flagship-size enc-dec model (d256/ff512,
6 encoder + 6 decoder layers, teacher-forced decoder) with the same harness
as bench.py — VERDICT r2 directive #5's PERF row.

Usage: python scripts/bench_encdec.py [--steps 6] [--remat]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=6)
    p.add_argument("--epochs-per-call", type=int, default=10)
    p.add_argument("--batch", type=int, default=512)
    p.add_argument("--n", type=int, default=4096)
    p.add_argument("--remat", action="store_true")
    p.add_argument("--fused", type=int, default=None,
                   help="whole-layer fused kernels: 1 = encoder + decoder "
                        "kernels on, 0 = both off, unset = both arms (the "
                        "round-4 decoder-kernel adoption measurement)")
    args = p.parse_args(argv)

    import jax
    jax.config.update("jax_default_prng_impl", "unsafe_rbg")
    import jax.numpy as jnp

    from transformergrooveinfilling_tpu.models import build_model
    from transformergrooveinfilling_tpu.models.transformer import (
        GrooveTransformerConfig)
    from transformergrooveinfilling_tpu.train.loop import (
        create_train_state, make_epoch_fn, make_optimizer)

    rng = np.random.default_rng(0)
    n = args.n
    x = jnp.asarray(rng.standard_normal((n, 32, 16)), jnp.float32)
    h = (rng.random((n, 32, 9)) < 0.3).astype(np.float32)
    y = jnp.asarray(np.concatenate(
        [h, h * rng.random(h.shape), h * (rng.random(h.shape) - 0.5)], 2),
        jnp.float32)

    arms = ((False, True) if args.fused is None else (bool(args.fused),))
    for fused in arms:
        cfg = GrooveTransformerConfig(
            d_model=256, n_heads=2, dim_feedforward=512, dropout=0.30,
            num_encoder_layers=6, num_decoder_layers=6, max_len=32,
            embedding_size_src=16, embedding_size_tgt=27,
            compute_dtype=jnp.bfloat16 if jax.default_backend() == "tpu"
            else jnp.float32, remat=args.remat,
            fused_layer=fused, fused_decoder_layer=fused)
        model = build_model(cfg)
        tx = make_optimizer("sgd", 0.089)
        state = create_train_state(model, cfg, tx, jax.random.PRNGKey(0))

        fn = make_epoch_fn(model, tx, 0.73, args.batch, n, donate=True,
                           n_epochs=args.epochs_per_call, encoder_only=False)
        key = jax.random.PRNGKey(1)
        state, m = fn(state, x, y, key)
        loss0 = final = float(np.asarray(m["loss"]))
        best = float("inf")
        for _ in range(args.steps):
            key, k = jax.random.split(key)
            t0 = time.perf_counter()
            state, m = fn(state, x, y, k)
            final = float(np.asarray(m["loss"]))
            best = min(best, time.perf_counter() - t0)
        seqs = n * args.epochs_per_call / best
        print(f"enc-dec d256/ff512 6+6L bs{args.batch} remat={args.remat} "
              f"fused_layers={fused} ({jax.default_backend()}): "
              f"{seqs:,.0f} seqs/s (loss {loss0:.3f}->{final:.3f})",
              flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
