#!/usr/bin/env python
"""GrooveXL fused-FFN measurement (VERDICT r2 directive #6).

docs/PERF.md's roofline says the flagship (ff 512) is near its practical
ceiling and the open wins are the FFN-heavy configs — RandomLow_lm (ff 2048,
73 TFLOP/s) and the GrooveXL probe (d1024/ff4096/12L remat, 93 TFLOP/s) —
where the round-2 VMEM-resident fused-FFN kernel could not run (weights past
VMEM). This script measures the whole training step with the new K/F-tiled
kernel (ops/fused_ffn.py) against the plain XLA path at those configs, plus
a hardware keep-rate check of the tiled kernel's in-kernel PRNG dropout.

Usage: python scripts/bench_groovexl_ffn.py [--configs xl lm] [--steps 6]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CONFIGS = {
    # name: (d_model, n_heads, ff, layers, dropout, batch, remat)
    "xl": (1024, 8, 4096, 12, 0.1, 128, True),
    "lm": (256, 4, 2048, 8, 0.16, 512, False),
    # the flagship production config (InfillingRandom/ClosedHH) — the target
    # of the whole-encoder-layer fused kernel (--toggle layer, round 4)
    "flagship": (256, 2, 512, 6, 0.30, 512, False),
}


def flops_per_seq(d, ff, layers, t=32, e_src=16, e_tgt=27):
    att = 4 * d * d + 2 * 32 * d  # qkv/out projections + score/value matmuls
    ffn = 2 * d * ff
    per_layer = 2 * (att + ffn)  # mul+add
    return 3 * t * (per_layer * layers + 2 * (e_src * d + d * e_tgt))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--configs", nargs="*", default=["lm", "xl"])
    p.add_argument("--steps", type=int, default=6)
    p.add_argument("--epochs-per-call", type=int, default=3)
    p.add_argument("--remat", type=int, default=None,
                   help="override the config's remat setting (0/1) — under "
                        "remat the backward replays the forward, so the "
                        "kernel's h_drop-only residual saving is moot")
    p.add_argument("--toggle", choices=["ffn", "ln", "layer"], default="ffn",
                   help="which fused kernel the on/off arms flip: the Pallas "
                        "FFN (default), dropout+add+LN (ops/fused_ln.py — "
                        "PERF.md's 'flips for much larger d_model' claim, "
                        "measured here at XL width), or the whole-encoder-"
                        "layer kernel (ops/fused_layer.py, round 4)")
    args = p.parse_args(argv)

    import jax
    jax.config.update("jax_default_prng_impl", "unsafe_rbg")
    import jax.numpy as jnp

    from transformergrooveinfilling_tpu.models import build_model
    from transformergrooveinfilling_tpu.models.transformer import (
        GrooveTransformerConfig)
    from transformergrooveinfilling_tpu.train.loop import (
        create_train_state, make_epoch_fn, make_optimizer)

    print("backend:", jax.default_backend(), flush=True)

    # hardware keep-rate check of the tiled kernel's PRNG (interpret mode
    # stubs it, so only the chip can validate rate>0)
    if jax.default_backend() == "tpu":
        from transformergrooveinfilling_tpu.ops.fused_ffn import (
            _RESIDENT_WEIGHT_BYTES, ffn_train)

        rng = np.random.default_rng(0)
        K, F = 1024, 4096
        assert 2 * K * F * 2 > _RESIDENT_WEIGHT_BYTES
        x = jnp.asarray(rng.standard_normal((256, K)), jnp.bfloat16)
        w1 = jnp.asarray(np.eye(K, F) , jnp.bfloat16)
        b1 = jnp.zeros((F,), jnp.float32)
        w2 = jnp.asarray(np.eye(F, K), jnp.bfloat16)
        b2 = jnp.zeros((K,), jnp.float32)
        ones = jnp.ones_like(x)
        rate = 0.3
        out = ffn_train(ones, w1, b1, w2, b2,
                        jnp.asarray([7], jnp.int32), rate, False)
        keep = float(jnp.mean((np.asarray(out) > 0).astype(np.float32)))
        print(f"tiled kernel keep-rate @ rate 0.3: {keep:.4f} "
              f"(expect ~{1 - rate:.2f} quantized)", flush=True)
        assert abs(keep - (1 - rate)) < 0.02
        # rate=0 parity vs XLA on hardware
        out0 = ffn_train(x, w1, b1, w2, b2, jnp.asarray([7], jnp.int32),
                         0.0, False)
        ref0 = jnp.maximum(x @ w1 + b1, 0) @ w2 + b2
        rel = float(jnp.max(jnp.abs(out0.astype(jnp.float32) - ref0) /
                            (jnp.abs(ref0) + 1e-2)))
        print(f"tiled kernel rate=0 max rel diff vs XLA: {rel:.5f}", flush=True)

    for name in args.configs:
        d, heads, ff, layers, rate, batch, remat = CONFIGS[name]
        if args.remat is not None:
            remat = bool(args.remat)
        n = batch * 4
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.standard_normal((n, 32, 16)), jnp.float32)
        h = (rng.random((n, 32, 9)) < 0.3).astype(np.float32)
        y = jnp.asarray(np.concatenate([h, h * 0.5, h * 0.1], 2), jnp.float32)

        for fused in (False, True):
            # one kernel per run: the toggled arm isolates that kernel's
            # whole-step effect (the other fused path stays off both arms)
            cfg = GrooveTransformerConfig(
                d_model=d, n_heads=heads, dim_feedforward=ff, dropout=rate,
                num_encoder_layers=layers, max_len=32, embedding_size_src=16,
                embedding_size_tgt=27, compute_dtype=jnp.bfloat16,
                remat=remat,
                fused_ffn=(fused if args.toggle == "ffn" else False),
                fused_dropout_ln=(fused if args.toggle == "ln" else False),
                fused_layer=(fused if args.toggle == "layer" else False))
            model = build_model(cfg)
            tx = make_optimizer("sgd", 0.05)
            state = create_train_state(model, cfg, tx, jax.random.PRNGKey(0))
            fn = make_epoch_fn(model, tx, 0.73, batch, n, donate=True,
                               n_epochs=args.epochs_per_call)
            key = jax.random.PRNGKey(2)
            state, m = fn(state, x, y, key)  # compile
            loss0 = final = float(np.asarray(m["loss"]))
            best = float("inf")
            for _ in range(args.steps):
                key, k = jax.random.split(key)
                t0 = time.perf_counter()
                state, m = fn(state, x, y, k)
                final = float(np.asarray(m["loss"]))
                best = min(best, time.perf_counter() - t0)
            seqs = n * args.epochs_per_call / best
            tf = seqs * flops_per_seq(d, ff, layers) / 1e12
            print(f"{name} d{d}/ff{ff}/{layers}L bs{batch} remat={remat} "
                  f"fused_{args.toggle}={fused}: {seqs:,.0f} seqs/s "
                  f"(~{tf:.0f} TFLOP/s, loss {loss0:.3f}->{final:.3f})",
                  flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
