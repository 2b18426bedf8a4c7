#!/usr/bin/env python
"""Close the flagship's last ~5 % question (VERDICT r5 item 7).

The headline is ~122 k seqs/s WITH dropout 0.30 through the whole-encoder-
layer fused kernel; the old "ceiling" row is 128 k measured dropout-OFF on
the UNFUSED path — an apples-to-oranges pair. This script measures the
2×2 (fused × dropout) grid with the same harness:

  fused,   rate 0.30   — the headline arm
  fused,   rate 0      — the fused path's own ceiling
  unfused, rate 0.30   — the round-3 default
  unfused, rate 0      — the 128 k row

The (fused@0 − fused@0.3) delta is the in-kernel dropout cost: mask DRAW
(pltpu PRNG per tile) + apply, with zero HBM mask traffic. If the headline
sits within that delta of the fused ceiling, the gap IS the generator floor
the attribution already measured (~29 GB/s RngBitGenerator; docs/PERF.md) —
measured equilibrium, not recoverable headroom.

Writes docs/flagship_gap.json.
Usage: python scripts/bench_flagship_gap.py [--steps 6] [--epochs 20]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

D, HEADS, FF, LAYERS, BS, T = 256, 2, 512, 6, 512, 32


def main(argv=None):
    global BS
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=6)
    p.add_argument("--epochs", type=int, default=20,
                   help="epochs per compiled dispatch (flagship epochs are "
                        "~2 ms of compute; amortize the tunnel RT)")
    p.add_argument("--smoke", action="store_true")
    args = p.parse_args(argv)

    import transformergrooveinfilling_tpu  # noqa: F401
    import jax
    jax.config.update("jax_default_prng_impl", "unsafe_rbg")
    import jax.numpy as jnp

    from transformergrooveinfilling_tpu.models import build_model
    from transformergrooveinfilling_tpu.models.transformer import (
        GrooveTransformerConfig)
    from transformergrooveinfilling_tpu.train.loop import (
        create_train_state, make_epoch_fn, make_optimizer)

    if args.smoke:
        BS = 32
    # bench.py's flagship harness: 4096 samples scanned as 8 batches of 512
    # per epoch — the grid's absolute numbers are then directly comparable
    # to the BENCH_r* headline, not just its internal ratios
    N = BS if args.smoke else 4096
    print("backend:", jax.default_backend(), flush=True)
    results = {"config": f"d{D}/ff{FF}/{LAYERS}L bs{BS} T{T}",
               "backend": jax.default_backend(),
               "epochs_per_dispatch": args.epochs, "arms": {}}
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((N, T, 16)), jnp.float32)
    h = (rng.random((N, T, 9)) < 0.3).astype(np.float32)
    y = jnp.asarray(np.concatenate([h, h * 0.5, h * 0.1], 2), jnp.float32)
    # flops_per_seq (bench_groovexl_ffn) at flagship dims, fwd+bwd
    macs = (4 * D * D + 2 * D * FF) * T * LAYERS
    fps = 2 * macs * 3

    for fused in (True, False):
        for rate in (0.30, 0.0):
            name = f"{'fused' if fused else 'unfused'}_rate{rate:g}"
            cfg = GrooveTransformerConfig(
                d_model=D, n_heads=HEADS, dim_feedforward=FF, dropout=rate,
                num_encoder_layers=LAYERS, max_len=T, embedding_size_src=16,
                embedding_size_tgt=27, compute_dtype=jnp.bfloat16,
                fused_layer=fused)
            model = build_model(cfg)
            tx = make_optimizer("sgd", 0.089)
            state = create_train_state(model, cfg, tx, jax.random.PRNGKey(0))
            fn = make_epoch_fn(model, tx, 0.73, BS, N, donate=False,
                               n_epochs=args.epochs)
            key = jax.random.PRNGKey(2)

            def call(state, key):
                key, k = jax.random.split(key)
                state, m = fn(state, x, y, k)
                return state, m, key

            state, m, key = call(state, key)  # compile
            best = float("inf")
            for _ in range(args.steps):
                t0 = time.perf_counter()
                state, m, key = call(state, key)
                float(np.asarray(m["loss"]))
                best = min(best, time.perf_counter() - t0)
            seqs = N * args.epochs / best
            results["arms"][name] = {
                "seqs_per_s": round(seqs),
                "tflops": round(seqs * fps / 1e12, 1),
                "ms_per_epoch": round(best / args.epochs * 1e3, 3)}
            print(f"{name:16s}: {seqs:9,.0f} seqs/s  "
                  f"{seqs * fps / 1e12:5.1f} TFLOP/s", flush=True)

    a = results["arms"]
    if "fused_rate0.3" in a and "fused_rate0" in a:
        fd = a["fused_rate0"]["seqs_per_s"]
        fh = a["fused_rate0.3"]["seqs_per_s"]
        results["analysis"] = {
            "fused_dropout_cost_pct": round(100 * (1 - fh / fd), 1),
            "note": "fused@0 - fused@0.3 = in-kernel mask draw+apply with "
                    "zero HBM mask traffic; if this accounts for the gap, "
                    "the headline sits at the PRNG floor (equilibrium)"}
        print(json.dumps(results["analysis"], indent=1))

    out = os.path.join(REPO, "docs", "flagship_gap.json")
    if not args.smoke:
        with open(out, "w") as f:
            json.dump(results, f, indent=1)
        print(f"wrote {out}")
    else:
        print(json.dumps(results, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
