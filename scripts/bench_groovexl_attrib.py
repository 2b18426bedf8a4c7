#!/usr/bin/env python
"""GrooveXL MFU attribution (VERDICT r3 directive #7).

docs/PERF.md records the GrooveXL probe (d1024/ff4096/12L, bs128, remat off)
at ~119 TFLOP/s ~= 60 % of v5e bf16 peak, with no decomposition of the other
40 %. This script reuses the flagship's whole-step ablation method at XL
width: every arm is the FULL compiled epoch program (the same make_epoch_fn
the production driver scans) with exactly one cost removed, plus standalone
speed-of-light probes that anchor each attribution in a measured ceiling
rather than the datasheet number.

Whole-step arms (epoch = scan over 4 batches of 128, timed over repeats):
  full         forward + backward + SGD update, dropout 0.1   (the PERF row)
  no_dropout   same, dropout 0.0                -> dropout mask cost
  no_update    grads computed (kept live via the grad_norm metric) but no
               optimizer update                 -> SGD update cost
  fwd_only     loss only, no jax.grad           -> backward cost
               (no_update - fwd_only)

Standalone probes (same shapes the XL step actually runs):
  mm_ffn       chained bf16 (B*T,1024)x(1024,4096)x(4096,1024) relu pairs —
               the practical MXU ceiling for the step's dominant matmuls
  mm_attn      batched (128*8)x(32,128)@(128,32) score/value einsums — the
               T=32 attention matmuls whose tiny contraction dims cannot
               tile the 128x128 systolic array efficiently
  ln           one f32 LayerNorm over (B*T,1024), scaled by the 25 LN sites
  sgd          jitted optax.sgd update over the real 353 M-param tree — pure
               f32 HBM traffic (read p, read g, write p)

Writes docs/groovexl_attrib.json and prints the PERF.md table.

Usage: python scripts/bench_groovexl_attrib.py [--steps 6] [--epochs 3]

Reference context: the hot loop being beaten is the reference's per-batch
torch loop (/root/reference/train.py:195-215); the reference itself never
ran at this width — GrooveXL is this repo's scaling probe (docs/PERF.md).
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

D, HEADS, FF, LAYERS, BS, T = 1024, 8, 4096, 12, 128, 32
RATE = 0.1
N = BS * 4  # 4 batches per epoch, like bench_groovexl_ffn.py


def main(argv=None):
    global D, HEADS, FF, LAYERS, BS, N
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=6)
    p.add_argument("--epochs", type=int, default=3,
                   help="epochs per compiled dispatch (tunnel amortization)")
    p.add_argument("--smoke", action="store_true",
                   help="tiny dims, CPU-runnable shape/plumbing check only")
    p.add_argument("--probes-only", action="store_true",
                   help="skip the whole-step arms; reuse the arm numbers "
                        "already in docs/groovexl_attrib.json")
    p.add_argument("--bs", type=int, default=None,
                   help="override batch size (bs-scaling recovery probe); "
                        "results print but are NOT written to the json")
    p.add_argument("--arms", default=None,
                   help="comma list of arms to run (default: all four)")
    args = p.parse_args(argv)
    if args.smoke:
        D, HEADS, FF, LAYERS, BS = 128, 1, 256, 2, 16
        N = BS * 4
    if args.bs:
        BS = args.bs
        N = BS * 4

    import transformergrooveinfilling_tpu  # noqa: F401 (applies TGI_PLATFORM)
    import jax
    jax.config.update("jax_default_prng_impl", "unsafe_rbg")
    import jax.numpy as jnp
    import optax

    from transformergrooveinfilling_tpu.models import build_model
    from transformergrooveinfilling_tpu.models.losses import calculate_loss
    from transformergrooveinfilling_tpu.models.transformer import (
        GrooveTransformerConfig)
    from transformergrooveinfilling_tpu.train.loop import (
        TrainState, create_train_state, make_epoch_fn, make_optimizer)
    from scripts.bench_groovexl_ffn import flops_per_seq

    print("backend:", jax.default_backend(), flush=True)
    results = {"config": f"d{D}/ff{FF}/{LAYERS}L bs{BS} remat=0",
               "backend": jax.default_backend(), "arms": {}, "probes": {}}

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((N, T, 16)), jnp.float32)
    h = (rng.random((N, T, 9)) < 0.3).astype(np.float32)
    y = jnp.asarray(np.concatenate([h, h * 0.5, h * 0.1], 2), jnp.float32)
    fps = flops_per_seq(D, FF, LAYERS)
    fwd_fps = fps / 3  # flops_per_seq counts fwd + 2x for the backward

    def timed(fn, *a, reps=args.steps):
        """Best-of-reps wall time of a jitted fn returning a SCALAR; forces
        materialization with a host fetch (the tunnel's block_until_ready
        returns early — docs/PERF.md measurement hygiene). Probes must
        amortize the ~30-100 ms dispatch RT over many in-program iterations."""
        out = fn(*a)  # compile
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            float(np.asarray(fn(*a)))
            best = min(best, time.perf_counter() - t0)
        return best, out

    # ---------------- whole-step arms ----------------
    def run_arm(name, rate, step_kind):
        cfg = GrooveTransformerConfig(
            d_model=D, n_heads=HEADS, dim_feedforward=FF, dropout=rate,
            num_encoder_layers=LAYERS, max_len=T, embedding_size_src=16,
            embedding_size_tgt=27, compute_dtype=jnp.bfloat16, remat=False)
        model = build_model(cfg)
        tx = make_optimizer("sgd", 0.05)
        state = create_train_state(model, cfg, tx, jax.random.PRNGKey(0))

        step_fn = None
        if step_kind == "no_update":
            def step_fn(state, bx, by, w, key):
                def loss_fn(params):
                    pred = model.apply({"params": params}, bx,
                                       deterministic=False,
                                       rngs={"dropout": key})
                    out = calculate_loss(pred, by, 0.73, sample_weights=w)
                    return out.total_loss, out
                grads, out = jax.grad(loss_fn, has_aux=True)(state.params)
                # grad_norm keeps the whole backward live in the scan
                m = {"loss": out.total_loss,
                     "grad_norm": optax.global_norm(grads)}
                return TrainState(step=state.step + 1, params=state.params,
                                  opt_state=state.opt_state), m
        elif step_kind == "fwd_only":
            def step_fn(state, bx, by, w, key):
                pred = model.apply({"params": state.params}, bx,
                                   deterministic=False,
                                   rngs={"dropout": key})
                out = calculate_loss(pred, by, 0.73, sample_weights=w)
                return (TrainState(step=state.step + 1, params=state.params,
                                   opt_state=state.opt_state),
                        {"loss": out.total_loss})

        fn = make_epoch_fn(model, tx, 0.73, BS, N, donate=True,
                           n_epochs=args.epochs, step_fn=step_fn)
        key = jax.random.PRNGKey(2)

        def call(state, key):
            key, k = jax.random.split(key)
            state, m = fn(state, x, y, k)
            return state, m, key

        best = float("inf")
        state, m, key = call(state, key)  # compile
        for _ in range(args.steps):
            t0 = time.perf_counter()
            state, m, key = call(state, key)
            float(np.asarray(m["loss"]))
            best = min(best, time.perf_counter() - t0)
        seqs = N * args.epochs / best
        # fwd_only runs a third of the step's FLOPs (no backward)
        tf = seqs * (fwd_fps if step_kind == "fwd_only" else fps) / 1e12
        ms = best / args.epochs * 1e3
        results["arms"][name] = {"seqs_per_s": round(seqs),
                                 "tflops": round(tf, 1),
                                 "epoch_ms": round(ms, 2)}
        print(f"{name:12s}: {seqs:8,.0f} seqs/s  {tf:6.1f} TFLOP/s  "
              f"{ms:7.2f} ms/epoch", flush=True)
        return best / args.epochs

    json_path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "docs", "groovexl_attrib.json")
    if args.probes_only:
        with open(json_path) as f:
            results["arms"] = json.load(f)["arms"]
    else:
        wanted = args.arms.split(",") if args.arms else None
        for name, rate, kind in [("full", RATE, "train"),
                                 ("no_dropout", 0.0, "train"),
                                 ("no_update", RATE, "no_update"),
                                 ("fwd_only", RATE, "fwd_only")]:
            if wanted is None or name in wanted:
                run_arm(name, rate, kind)
    if args.bs:
        print(json.dumps(results["arms"], indent=1))
        return 0

    # ---------------- standalone probes ----------------
    steps_per_epoch = N // BS

    # measured dispatch round-trip: a trivial scalar program, fetched — the
    # floor every single-dispatch timing carries on the tunneled link
    one = jnp.ones((8, 8), jnp.float32)
    rt, _ = timed(jax.jit(lambda a: jnp.sum(a + 1.0)), one)
    results["probes"]["dispatch_rt_ms"] = round(rt * 1e3, 2)
    print(f"dispatch RT: {rt * 1e3:.1f} ms", flush=True)

    # MXU ceiling at the step's dominant matmul shape (the FFN pair);
    # enough serial pairs that compute dwarfs the dispatch RT
    w1 = jnp.asarray(rng.standard_normal((D, FF)) * 0.02, jnp.bfloat16)
    w2 = jnp.asarray(rng.standard_normal((FF, D)) * 0.02, jnp.bfloat16)
    xm = jnp.asarray(rng.standard_normal((BS * T, D)), jnp.bfloat16)
    PAIRS = 512

    @jax.jit
    def mm_ffn(xm):
        def body(i, a):
            return jnp.maximum(a @ w1, 0) @ w2 * 0.5
        return jnp.sum(jax.lax.fori_loop(0, PAIRS, body, xm)
                       .astype(jnp.float32))

    t, _ = timed(mm_ffn, xm)
    t -= rt
    fl = PAIRS * 2 * (BS * T) * D * FF * 2
    results["probes"]["mm_ffn_tflops"] = round(fl / t / 1e12, 1)
    print(f"mm_ffn ceiling: {fl / t / 1e12:6.1f} TFLOP/s "
          f"((4096,1024)x(1024,4096) bf16 relu pairs)", flush=True)

    # the T=32 attention score/value einsums, all heads batched
    hd = D // HEADS
    q = jnp.asarray(rng.standard_normal((BS * HEADS, T, hd)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((BS * HEADS, T, hd)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((BS * HEADS, T, hd)), jnp.bfloat16)
    ITER = 1024

    @jax.jit
    def mm_attn(q):
        def body(i, q):
            s = jnp.einsum("bth,bsh->bts", q, k) * (1.0 / np.sqrt(hd))
            w = jax.nn.softmax(s.astype(jnp.float32), axis=-1)
            return jnp.einsum("bts,bsh->bth", w.astype(jnp.bfloat16), v)
        return jnp.sum(jax.lax.fori_loop(0, ITER, body, q)
                       .astype(jnp.float32))

    t, _ = timed(mm_attn, q)
    t -= rt
    fl = ITER * 2 * 2 * (BS * HEADS) * T * T * hd
    results["probes"]["mm_attn_tflops"] = round(fl / t / 1e12, 1)
    # what the step spends there per epoch (12 layers x steps_per_epoch)
    attn_ms = t / ITER * LAYERS * steps_per_epoch * 1e3
    results["probes"]["attn_scorevalue_ms_per_epoch"] = round(attn_ms, 2)
    print(f"mm_attn: {fl / t / 1e12:6.1f} TFLOP/s (batched (32,128)@(128,32)"
          f" + softmax) -> {attn_ms:.2f} ms/epoch across {LAYERS} layers",
          flush=True)

    # LayerNorm VPU probe, scaled by the 25 LN sites (2/layer + final)
    g = jnp.ones((D,), jnp.float32)
    b = jnp.zeros((D,), jnp.float32)
    xf = jnp.asarray(rng.standard_normal((BS * T, D)), jnp.float32)
    SITES = 2 * LAYERS + 1
    LN_REPS = 40

    @jax.jit
    def ln(xf):
        def body(i, a):
            mu = jnp.mean(a, axis=-1, keepdims=True)
            var = jnp.mean(jnp.square(a - mu), axis=-1, keepdims=True)
            return (a - mu) * jax.lax.rsqrt(var + 1e-5) * g + b
        return jnp.sum(jax.lax.fori_loop(0, SITES * LN_REPS, body, xf))

    t, _ = timed(ln, xf)
    t = (t - rt) / LN_REPS
    ln_ms = t * steps_per_epoch * 1e3
    results["probes"]["ln_ms_per_epoch"] = round(ln_ms, 2)
    ln_gbs = SITES * 2 * xf.nbytes / t / 1e9
    results["probes"]["ln_hbm_gb_s"] = round(ln_gbs, 1)
    print(f"ln x{SITES} sites: {ln_ms:.2f} ms/epoch (~{ln_gbs:.0f} GB/s)",
          flush=True)

    # SGD update over the real parameter tree: pure f32 HBM traffic
    cfg = GrooveTransformerConfig(
        d_model=D, n_heads=HEADS, dim_feedforward=FF, dropout=RATE,
        num_encoder_layers=LAYERS, max_len=T, embedding_size_src=16,
        embedding_size_tgt=27, compute_dtype=jnp.bfloat16)
    model = build_model(cfg)
    tx = make_optimizer("sgd", 0.05)
    state = create_train_state(model, cfg, tx, jax.random.PRNGKey(0))
    gkey = jax.random.PRNGKey(3)
    grads = jax.tree.map(
        lambda a: jax.random.normal(gkey, a.shape, a.dtype) * 1e-3,
        state.params)
    n_params = sum(int(np.prod(l.shape))
                   for l in jax.tree.leaves(state.params))
    results["params_millions"] = round(n_params / 1e6, 1)

    SGD_REPS = 40

    @jax.jit
    def sgd(params, grads):
        def body(i, p):
            # scale the grads by one element OF THE EVOLVING PARAMS: a true
            # loop-carried data dependence. A purely index-based scale
            # (1 + i*eps) is NOT enough — the unrolled updates are affine in
            # the constant grads and XLA's algebraic simplifier folds all 40
            # AXPYs into one (measured: the loop ran faster than a bare
            # dispatch). The one-element read is free; the multiply fuses
            # into the update's elementwise pass, so HBM traffic per
            # iteration stays read-p + read-g + write-p.
            s = jax.tree.leaves(p)[0].reshape(-1)[0] * 1e-30 + 1.0
            g = jax.tree.map(lambda a: a * s, grads)
            updates, _ = tx.update(g, state.opt_state, p)
            return optax.apply_updates(p, updates)
        p = jax.lax.fori_loop(0, SGD_REPS, body, params)
        # consume EVERY leaf — a partial sum lets XLA dead-code-eliminate
        # the untouched leaves' updates out of the loop entirely
        return sum(jnp.sum(l) for l in jax.tree.leaves(p))

    t, _ = timed(sgd, state.params, grads)
    t = (t - rt) / SGD_REPS
    sgd_ms = t * steps_per_epoch * 1e3
    results["probes"]["sgd_ms_per_epoch"] = round(sgd_ms, 2)
    gbs = 3 * 4 * n_params / t / 1e9
    results["probes"]["sgd_hbm_gb_s"] = round(gbs, 1)
    print(f"sgd update: {sgd_ms:.2f} ms/epoch ({n_params/1e6:.0f} M params, "
          f"~{gbs:.0f} GB/s effective)", flush=True)

    # ---------------- attribution ----------------
    e = {k: v["epoch_ms"] for k, v in results["arms"].items()}
    attrib = {
        "dropout_ms": round(e["full"] - e["no_dropout"], 2),
        "optimizer_ms": round(e["full"] - e["no_update"], 2),
        "backward_ms": round(e["no_update"] - e["fwd_only"], 2),
        "forward_ms": round(e["fwd_only"], 2),
    }
    # speed-of-light epoch at the measured matmul ceiling (CPU smoke can
    # round the tiny probe to 0.0 TFLOP/s — skip the ratio there)
    ceiling = results["probes"]["mm_ffn_tflops"]
    if ceiling > 0:
        ideal_ms = (N * fps / (ceiling * 1e12)) * 1e3
        attrib["ideal_ms_at_mm_ceiling"] = round(ideal_ms, 2)
    results["attribution"] = attrib
    print(json.dumps(attrib, indent=1), flush=True)

    if not args.smoke:
        with open(json_path, "w") as f:
            json.dump(results, f, indent=1)
        print("wrote", json_path, flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
