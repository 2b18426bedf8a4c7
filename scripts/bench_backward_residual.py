#!/usr/bin/env python
"""Probe the GrooveXL attribution's ~20-23 % "residual" term directly
(VERDICT r5 item 3).

docs/groovexl_attrib.json decomposes the XL step (d1024/ff4096/12L, bs128)
and attributes ~25-29 ms/epoch to "non-matmul fwd/bwd traffic" — computed by
subtraction, not measured. This script measures it:

1. **Compiler byte/FLOP accounting**: AOT cost_analysis of the exact epoch
   program — total FLOPs and HBM bytes accessed. With the measured MXU
   ceiling (196.4 TF, attrib probe) and the measured elementwise HBM
   bandwidth (probe 3), a two-resource speed-of-light
   ``ideal = max(flop_ms, byte_ms)`` either explains the epoch time or
   leaves a real scheduling gap.
2. **dW/dX-shape matmul ceilings**: chained matmuls at the backward's own
   shapes — dW contracts over the 4096 batch·T rows; dX mirrors the
   forward. Confirms (or denies) that backward matmuls run at the forward
   probe's ceiling.
3. **Elementwise HBM bandwidth**: a chained residual-style pass (read a,
   read b, write out) at the step's (BS·T, d) f32/bf16 shapes — the
   achieved bandwidth for exactly the traffic class the residual term is
   made of.
4. **Levers (full-step arms)**: remat=False (baseline, the PERF row),
   full remat, and selective remat_policy="dots" (matmul outputs stored,
   elementwise recomputed — models/transformer.py::_remat_wrap).

Writes docs/backward_residual.json. Usage:
  python scripts/bench_backward_residual.py [--steps 6] [--epochs 3]
  [--smoke]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

D, HEADS, FF, LAYERS, BS, T = 1024, 8, 4096, 12, 128, 32
RATE = 0.1


def main(argv=None):
    global D, HEADS, FF, LAYERS, BS
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=6)
    p.add_argument("--epochs", type=int, default=3)
    p.add_argument("--smoke", action="store_true")
    p.add_argument("--skip-arms", action="store_true",
                   help="probes + cost analysis only")
    args = p.parse_args(argv)
    if args.smoke:
        D, HEADS, FF, LAYERS, BS = 128, 1, 256, 2, 16

    import transformergrooveinfilling_tpu  # noqa: F401
    import jax
    jax.config.update("jax_default_prng_impl", "unsafe_rbg")
    import jax.numpy as jnp

    from transformergrooveinfilling_tpu.models import build_model
    from transformergrooveinfilling_tpu.models.transformer import (
        GrooveTransformerConfig)
    from transformergrooveinfilling_tpu.train.loop import (
        create_train_state, make_epoch_fn, make_optimizer)
    from scripts.bench_groovexl_ffn import flops_per_seq

    N = BS * 4
    print("backend:", jax.default_backend(), flush=True)
    results = {"config": f"d{D}/ff{FF}/{LAYERS}L bs{BS}",
               "backend": jax.default_backend()}
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((N, T, 16)), jnp.float32)
    h = (rng.random((N, T, 9)) < 0.3).astype(np.float32)
    y = jnp.asarray(np.concatenate([h, h * 0.5, h * 0.1], 2), jnp.float32)

    def timed(fn, *a, reps=args.steps):
        fn(*a)
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            float(np.asarray(fn(*a)))
            best = min(best, time.perf_counter() - t0)
        return best

    one = jnp.ones((8, 8), jnp.float32)
    rt = timed(jax.jit(lambda a: jnp.sum(a + 1.0)), one)
    results["dispatch_rt_ms"] = round(rt * 1e3, 2)
    print(f"dispatch RT: {rt*1e3:.1f} ms", flush=True)

    # ---------- 1. compiler accounting of the real epoch program ----------
    def build_epoch(remat, policy=None):
        cfg = GrooveTransformerConfig(
            d_model=D, n_heads=HEADS, dim_feedforward=FF, dropout=RATE,
            num_encoder_layers=LAYERS, max_len=T, embedding_size_src=16,
            embedding_size_tgt=27, compute_dtype=jnp.bfloat16,
            remat=remat, remat_policy=policy)
        model = build_model(cfg)
        tx = make_optimizer("sgd", 0.05)
        state = create_train_state(model, cfg, tx, jax.random.PRNGKey(0))
        fn = make_epoch_fn(model, tx, 0.73, BS, N, donate=False,
                           n_epochs=args.epochs)
        return fn, state

    fn, state = build_epoch(False)
    key = jax.random.PRNGKey(2)
    lowered = jax.jit(fn).lower(state, x, y, key)
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    ca = ca[0] if isinstance(ca, list) else ca
    flops = float(ca.get("flops", 0.0)) / args.epochs
    bytes_acc = float(ca.get("bytes accessed", 0.0)) / args.epochs
    results["cost_analysis"] = {
        "flops_per_epoch_T": round(flops / 1e12, 3),
        "hbm_bytes_per_epoch_GB": round(bytes_acc / 1e9, 3),
        "note": "XLA cost model on the exact compiled epoch program "
                "(per-epoch after dividing the n_epochs dispatch)"}
    print(f"cost_analysis: {flops/1e12:.2f} TFLOP, "
          f"{bytes_acc/1e9:.2f} GB accessed per epoch", flush=True)

    # analytic FLOP check (flops_per_seq counts fwd + 2x bwd)
    fps = flops_per_seq(D, FF, LAYERS)
    results["analytic_flops_per_epoch_T"] = round(fps * N / 1e12, 3)

    # ---------- 2. backward-shape matmul ceilings ----------
    rows = BS * T
    a_f = jnp.asarray(rng.standard_normal((rows, D)), jnp.bfloat16)
    g_f = jnp.asarray(rng.standard_normal((rows, FF)), jnp.bfloat16)
    PAIRS = 256

    @jax.jit
    def mm_dw(a):
        # dW1 = x^T @ dh : (D, rows) @ (rows, FF) — contraction over rows
        def body(i, carry):
            a, acc = carry
            dw = a.T @ g_f  # (D, FF)
            return a * 0.5 + 0.5 * a, acc + jnp.sum(dw.astype(jnp.float32))
        _, acc = jax.lax.fori_loop(0, PAIRS, body, (a, jnp.float32(0)))
        return acc

    t = timed(mm_dw, a_f) - rt
    fl = PAIRS * 2 * D * rows * FF
    results["mm_dw_tflops"] = round(fl / t / 1e12, 1)
    print(f"dW-shape ceiling ((1024,4096rows)@(rows,4096)): "
          f"{fl/t/1e12:6.1f} TFLOP/s", flush=True)

    w2 = jnp.asarray(rng.standard_normal((FF, D)) * 0.02, jnp.bfloat16)

    @jax.jit
    def mm_dx(g):
        # dh->dx : (rows, FF) @ (FF, D) — the dX mirror of the fwd pair
        def body(i, g):
            dx = g @ w2  # (rows, D)
            return jnp.tile(dx, (1, FF // D)) * (D / FF)
        return jnp.sum(jax.lax.fori_loop(0, PAIRS, body, g)
                       .astype(jnp.float32))

    t = timed(mm_dx, g_f) - rt
    fl = PAIRS * 2 * rows * FF * D
    results["mm_dx_tflops"] = round(fl / t / 1e12, 1)
    print(f"dX-shape ceiling ((rows,4096)@(4096,1024)): "
          f"{fl/t/1e12:6.1f} TFLOP/s", flush=True)

    # ---------- 3. elementwise HBM bandwidth at step shapes ----------
    xa = jnp.asarray(rng.standard_normal((rows, D)), jnp.float32)
    xb = jnp.asarray(rng.standard_normal((rows, D)), jnp.float32)
    EW = 512

    @jax.jit
    def ew_chain(a, b):
        # read a, read b, write out — the residual-add/cotangent-accumulate
        # class; data exceeds VMEM only via the chain's rotation
        def body(i, ab):
            a, b = ab
            c = a + 1.00001 * b
            return b, c
        a, b = jax.lax.fori_loop(0, EW, body, (a, b))
        return jnp.sum(b)

    t = timed(ew_chain, xa, xb) - rt
    bytes_ew = EW * 3 * rows * D * 4
    bw = bytes_ew / t / 1e9
    results["elementwise_hbm_gb_s"] = round(bw, 1)
    print(f"elementwise chain bandwidth (f32 (4096,1024) a+b->c): "
          f"{bw:6.1f} GB/s", flush=True)

    # two-resource speed of light for the epoch program
    mm_ceiling = 196.4e12  # measured, docs/groovexl_attrib.json
    flop_ms = flops / mm_ceiling * 1e3
    byte_ms = bytes_acc / (bw * 1e9) * 1e3
    results["speed_of_light"] = {
        "flop_ms_at_196T": round(flop_ms, 1),
        "byte_ms_at_measured_bw": round(byte_ms, 1),
        "ideal_epoch_ms": round(max(flop_ms, byte_ms), 1),
        "note": "max(flop,byte) assumes perfect overlap; sum is the "
                "no-overlap bound"}
    print(f"speed of light: flops {flop_ms:.1f} ms, bytes {byte_ms:.1f} ms "
          f"-> ideal {max(flop_ms, byte_ms):.1f} ms/epoch", flush=True)

    # ---------- 4. lever arms ----------
    if not args.skip_arms:
        results["arms"] = {}
        for name, remat, policy in (("baseline_remat_off", False, None),
                                    ("full_remat", True, None),
                                    ("remat_dots", True, "dots")):
            fn, state = build_epoch(remat, policy)

            def call(state, key):
                key, k = jax.random.split(key)
                state, m = fn(state, x, y, k)
                return state, m, key

            state, m, key2 = call(state, jax.random.PRNGKey(3))  # compile
            best = float("inf")
            for _ in range(args.steps):
                t0 = time.perf_counter()
                state, m, key2 = call(state, key2)
                float(np.asarray(m["loss"]))
                best = min(best, time.perf_counter() - t0)
            seqs = N * args.epochs / best
            tf = seqs * fps / 1e12
            ms = best / args.epochs * 1e3
            results["arms"][name] = {"seqs_per_s": round(seqs),
                                     "tflops": round(tf, 1),
                                     "epoch_ms": round(ms, 2)}
            print(f"{name:18s}: {seqs:8,.0f} seqs/s  {tf:6.1f} TFLOP/s  "
                  f"{ms:7.2f} ms/epoch", flush=True)

    out = os.path.join(REPO, "docs", "backward_residual.json")
    if not args.smoke:
        with open(out, "w") as f:
            json.dump(results, f, indent=1)
        print(f"wrote {out}")
    else:
        print(json.dumps(results, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
