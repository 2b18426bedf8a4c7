#!/usr/bin/env python
"""Hardware validation of the whole-encoder-layer fused kernel
(ops/fused_layer.py). Interpret-mode tests (tests/test_fused_layer.py) pin
rate=0 exactly; everything PRNG-dependent needs the real chip:

1. rate=0 forward parity vs the plain XLA EncoderLayer (bf16 tolerance).
2. keep-rate statistics of the FFN-internal site, observed through the
   h_drop residual with W1=0 / b1=+1 (ReLU everywhere-positive → the kept
   fraction IS the quantized keep rate).
3. seeded determinism: same seed → identical outputs; different seed →
   different outputs.
4. forward/backward mask CONSISTENCY at rate>0: the backward regenerates
   all four sites' masks from the same per-(tile, site) streams, so the
   custom-VJP gradient must match central finite differences of the (seed-
   fixed, deterministic) forward. This is the check that fails if fwd and
   bwd PRNG streams ever diverge.

Usage: python scripts/validate_fused_layer.py   (real TPU via axon)
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import transformergrooveinfilling_tpu  # noqa: F401
import jax
import jax.numpy as jnp

from transformergrooveinfilling_tpu.models.transformer import EncoderLayer
from transformergrooveinfilling_tpu.ops.dropout import quantized_keep_rate
from transformergrooveinfilling_tpu.ops.fused_layer import (
    _bwd_call, _fwd_call, encoder_layer_train,
)

D, H, FF, T = 256, 2, 512, 32


def make_args(rng, dtype=jnp.float32):
    return dict(
        wqkv=jnp.asarray(rng.standard_normal((D, 3 * D)) * 0.05, dtype),
        bqkv=jnp.asarray(rng.standard_normal(3 * D) * 0.01, jnp.float32),
        wo=jnp.asarray(rng.standard_normal((D, D)) * 0.05, dtype),
        bo=jnp.asarray(rng.standard_normal(D) * 0.01, jnp.float32),
        g1=jnp.asarray(1 + 0.1 * rng.standard_normal(D), jnp.float32),
        b1=jnp.asarray(0.1 * rng.standard_normal(D), jnp.float32),
        w1=jnp.asarray(rng.standard_normal((D, FF)) * 0.05, dtype),
        b1f=jnp.asarray(rng.standard_normal(FF) * 0.01, jnp.float32),
        w2=jnp.asarray(rng.standard_normal((FF, D)) * 0.05, dtype),
        b2f=jnp.asarray(rng.standard_normal(D) * 0.01, jnp.float32),
        g2=jnp.asarray(1 + 0.1 * rng.standard_normal(D), jnp.float32),
        b2=jnp.asarray(0.1 * rng.standard_normal(D), jnp.float32))


def main():
    assert jax.default_backend() == "tpu", "hardware validation needs a chip"
    record = {"kernel": "fused_layer (whole encoder layer)",
              "shapes": {"d_model": D, "n_heads": H, "dim_ff": FF, "T": T}}
    rng = np.random.default_rng(0)
    m = 512

    # 1. rate=0 parity vs the module's plain path
    x3 = jnp.asarray(rng.standard_normal((m // T, T, D)), jnp.float32)
    layer = EncoderLayer(D, H, FF, 0.0, fused_layer=False)
    params = layer.init(jax.random.PRNGKey(0), x3, deterministic=True)[
        "params"]
    key = {"dropout": jax.random.PRNGKey(3)}
    y_ref = np.asarray(layer.apply({"params": params}, x3,
                                   deterministic=False, rngs=key))
    y_fused = np.asarray(EncoderLayer(D, H, FF, 0.0, fused_layer=True).apply(
        {"params": params}, x3, deterministic=False, rngs=key))
    rel = np.max(np.abs(y_fused - y_ref) / (np.abs(y_ref) + 1e-2))
    print(f"rate=0 forward parity vs XLA: max rel diff {rel:.5f}")
    record["rate0_forward_max_rel_diff"] = float(rel)
    assert rel < 5e-3

    # 2. keep-rate through the h_drop residual (W1=0, b1=+1 → ReLU all-on)
    rate = 0.3
    args = make_args(np.random.default_rng(1))
    probe = dict(args, w1=jnp.zeros((D, FF)), b1f=jnp.ones(FF))
    x = jnp.asarray(rng.standard_normal((m, D)), jnp.float32)
    seed = jnp.asarray([11], jnp.int32)
    outs = _fwd_call(x, *probe.values(), seed, rate=rate, n_heads=H,
                     seq_len=T, interpret=False)
    h = np.asarray(outs[3])  # (y, qkv, a1, h_drop, a2)
    keep = float((h > 0).mean())
    print(f"FFN-site keep rate @ rate {rate}: {keep:.4f} "
          f"(quantized target {quantized_keep_rate(rate):.4f})")
    record["keep_rate"] = {"rate": rate, "observed": keep,
                           "quantized_target": float(quantized_keep_rate(rate)),
                           "seed": 11}
    assert abs(keep - quantized_keep_rate(rate)) < 0.01

    # 3. seeded determinism
    f = jax.jit(lambda x, s: encoder_layer_train(
        x, *args.values(), s, rate, H, T, False))
    y_a = np.asarray(f(x, seed))
    y_b = np.asarray(f(x, seed))
    y_c = np.asarray(f(x, jnp.asarray([12], jnp.int32)))
    assert np.array_equal(y_a, y_b), "same seed must be bit-identical"
    assert not np.array_equal(y_a, y_c), "different seed must differ"
    print("seeded determinism: ok (same-seed identical, cross-seed differs)")
    record["seeded_determinism"] = "same-seed bit-identical, cross-seed differs"

    # 4. fwd/bwd mask consistency via DIRECTIONAL finite differences at
    # rate>0, with a seed-mismatch NEGATIVE control. At DEFAULT matmul
    # precision this check is unusable on TPU: every internal matmul
    # quantizes its operands to bf16 passes, and those deterministic
    # ~2e-3/entry rounding fields propagate through the Jacobian into the
    # difference quotient as an x-dependent 10-40 % error (measured round 4;
    # the plain XLA layer "fails" identically, and one lucky x draw can show
    # <1 % while the next shows 42 %). Under HIGHEST precision (f32
    # multi-pass on the MXU — Mosaic honors the trace-time precision inside
    # pallas_call) the floor drops to ~2-7 % per direction, while a diverged
    # mask stream shifts the gradient by 50-300 % (the wrong-seed control
    # below). Rows shrink to 384 (row tile 128): the f32 multi-pass backward
    # at tile 256 overflows the 16 MB scoped VMEM limit.
    with jax.default_matmul_precision("highest"):
        m4 = 384
        x4 = jnp.asarray(rng.standard_normal((m4, D)), jnp.float32)
        fwd = jax.jit(lambda x: encoder_layer_train(
            x, *args.values(), seed, rate, H, T, False))
        rng2 = np.random.default_rng(7)
        u = rng2.standard_normal((m4, D)).astype(np.float32)
        outs = _fwd_call(x4, *args.values(), seed, rate=rate, n_heads=H,
                         seq_len=T, interpret=False)
        _, qkv, a1r, hr, a2r = outs

        def grad_x(s):
            r = _bwd_call(jnp.asarray(u), x4, qkv, a1r, hr, a2r,
                          args["wqkv"], args["wo"], args["w1"], args["w2"],
                          args["g1"], args["b1"], args["g2"],
                          jnp.asarray([s], jnp.int32),
                          rate=rate, n_heads=H, seq_len=T, interpret=False)
            return np.asarray(r[0], np.float64)

        gx_match, gx_mis = grad_x(11), grad_x(12)
        eps, k = 1e-2, 6
        fds, ans, anxs = [], [], []
        for trial in range(k):
            e = rng2.standard_normal((m4, D)).astype(np.float32)
            yp = np.asarray(fwd(x4 + eps * jnp.asarray(e)), np.float64)
            ym = np.asarray(fwd(x4 - eps * jnp.asarray(e)), np.float64)
            fds.append(np.vdot(u.astype(np.float64), yp - ym) / (2 * eps))
            ans.append(np.vdot(gx_match, e.astype(np.float64)))
            anxs.append(np.vdot(gx_mis, e.astype(np.float64)))
    fds, ans, anxs = (np.array(v) for v in (fds, ans, anxs))
    rel = np.linalg.norm(fds - ans) / np.linalg.norm(ans)
    relx = np.linalg.norm(fds - anxs) / np.linalg.norm(anxs)
    for t in range(k):
        print(f"  dir {t}: fd {fds[t]:+9.3f}  vjp {ans[t]:+9.3f}  "
              f"wrong-seed vjp {anxs[t]:+9.3f}")
    print(f"aggregate rel residual: vjp {rel:.4f}  wrong-seed {relx:.4f}")
    record["fwd_bwd_mask_consistency"] = {
        "rate": rate, "directions": k,
        "vjp_vs_fd_rel_residual": float(rel),
        "wrong_seed_control_rel_residual": float(relx),
        "matmul_precision": "highest"}
    assert rel < 0.08, (
        "custom-VJP gradient disagrees with finite differences — "
        "fwd/bwd PRNG streams diverged?")
    assert relx > 0.20, (
        "negative control failed: a wrong-seed backward matched the "
        "forward — the check has lost its discriminating power")
    print("fwd/bwd mask consistency: ok (and seed-mismatch is detected)")

    # 5. the kernel INSIDE the shard_map dp step (fused_layer × data
    # parallelism, round 4): a 1-device "data" mesh on the real chip checks
    # that Mosaic lowers under the vma-checked manual context and that the
    # custom-VJP's varying weight cotangents psum into the replicated param
    # gradients (train/loop.py::_make_dp_shard_step). With the dp step's
    # shard-index key fold replicated on the plain step, the in-kernel PRNG
    # streams are identical → the two steps must agree to f32 reduction
    # noise at dropout 0.3.
    from transformergrooveinfilling_tpu.models import build_model
    from transformergrooveinfilling_tpu.models.transformer import (
        GrooveTransformerConfig,
    )
    from transformergrooveinfilling_tpu.parallel.mesh import (
        make_mesh, replicated,
    )
    from transformergrooveinfilling_tpu.train.loop import (
        create_train_state, make_optimizer, make_train_step,
    )

    cfg = GrooveTransformerConfig(
        d_model=D, n_heads=H, dim_feedforward=FF, dropout=0.3,
        num_encoder_layers=2, embedding_size_src=16, fused_layer=True)
    model = build_model(cfg)
    tx = make_optimizer("sgd", 0.05)
    st = create_train_state(model, cfg, tx, jax.random.PRNGKey(0))
    bx = jnp.asarray(rng.standard_normal((8, T, 16)), jnp.float32)
    hb = (rng.random((8, T, 9)) < 0.3).astype(np.float32)
    by = jnp.asarray(np.concatenate([hb, hb * 0.5, hb * 0.1], 2),
                     jnp.float32)
    w = jnp.ones((8,), jnp.float32)
    key0 = jax.random.PRNGKey(21)

    plan = make_mesh(n_data=1, n_model=1, devices=jax.devices()[:1])
    dp_step = make_train_step(model, tx, 0.73, dp_mesh=plan.mesh)
    s_dp, m_dp = dp_step(
        jax.device_put(st, replicated(plan)),
        jax.device_put(bx, replicated(plan)),
        jax.device_put(by, replicated(plan)),
        jax.device_put(w, replicated(plan)), key0)

    plain_step = make_train_step(model, tx, 0.73)
    s_pl, m_pl = plain_step(st, bx, by, w, jax.random.fold_in(key0, 0))

    dl = abs(float(m_dp["loss"]) - float(m_pl["loss"]))
    dp_params = jax.device_get(s_dp.params)
    pl_params = jax.device_get(s_pl.params)
    dmax = max(jax.tree.leaves(jax.tree.map(
        lambda a, b: float(np.max(np.abs(np.asarray(a) - np.asarray(b)))),
        dp_params, pl_params)))
    print(f"dp_shard fused step vs plain fused step: dloss {dl:.2e}, "
          f"max param diff {dmax:.2e}")
    record["dp_shard_cross_check"] = {"dloss": dl, "max_param_diff": dmax,
                                      "dropout": 0.3}
    assert dl < 1e-5 and dmax < 1e-5, (
        "fused kernel under shard_map diverged from the plain fused step")
    print("fused_layer x dp (shard_map) on hardware: ok")

    # 6. hd-64 lane-group packing on hardware (lm width d256/h4/ff2048):
    # interpret mode already pins rate-0 math, but only real Mosaic lowering
    # exercises the masked-operand matmuls' lane layout. Check rate-0
    # forward + full grad parity vs the plain XLA layer, then seeded
    # determinism at rate>0 (the packed path reuses the validated per-head
    # mask sites, so keep-rate stats are covered by check 2).
    dl_, hl_, ffl_ = 256, 4, 2048
    # The tight f32 grad parity runs at ff512: hd-64 packing is about the
    # ATTENTION matmuls' lane layout (head dim 64), not FFN width — and the
    # f32 backward at ff2048 cannot fit scoped VMEM at any row tile
    # (measured compile-time OOM on v5e: 18.0M @ tile 256, 20.6M @ tile
    # 128, limit 16M). The full lm width is covered below by the forward +
    # seeded-determinism run.
    ff_par = 512
    x6 = jnp.asarray(np.random.default_rng(8).standard_normal((12, T, dl_)),
                     jnp.float32)
    mk = lambda fused: EncoderLayer(dl_, hl_, ff_par, 0.0, fused_layer=fused)
    params6 = mk(False).init(jax.random.PRNGKey(0), x6,
                             deterministic=True)["params"]
    key6 = {"dropout": jax.random.PRNGKey(5)}

    def loss6(fused, params, x):
        y = mk(fused).apply({"params": params}, x, deterministic=False,
                            rngs=key6)
        w = jnp.arange(y.size, dtype=jnp.float32).reshape(y.shape) / y.size
        return jnp.sum(y * w), y

    (_, y6r), g6r = jax.value_and_grad(loss6, argnums=(1, 2), has_aux=True)(
        False, params6, x6)
    (_, y6f), g6f = jax.value_and_grad(loss6, argnums=(1, 2), has_aux=True)(
        True, params6, x6)
    y6r, y6f = np.asarray(y6r), np.asarray(y6f)
    rel6 = np.max(np.abs(y6f - y6r) / (np.abs(y6r) + 1e-2))
    gr = np.concatenate([np.asarray(l).ravel() for l in jax.tree.leaves(g6r)])
    gf = np.concatenate([np.asarray(l).ravel() for l in jax.tree.leaves(g6f)])
    grel6 = np.linalg.norm(gf - gr) / max(np.linalg.norm(gr), 1e-9)
    print(f"hd-64 packed rate=0 parity: fwd max rel {rel6:.5f}, "
          f"grad norm-rel {grel6:.5f}")
    record["hd64_packed"] = {"fwd_max_rel": float(rel6),
                             "grad_norm_rel": float(grel6),
                             "shapes": {"d_model": dl_, "n_heads": hl_,
                                        "dim_ff": ff_par},
                             "note": "grad parity at ff512 — the f32 "
                                     "backward at ff2048 exceeds scoped "
                                     "VMEM on v5e; lm width covered by the "
                                     "fwd+determinism run below"}
    assert rel6 < 5e-3 and grel6 < 5e-3, "hd-64 packing diverged from XLA"
    # arg dict at lm width (make_args is flagship-shaped)
    r10 = np.random.default_rng(10)
    args6 = dict(
        wqkv=jnp.asarray(r10.standard_normal((dl_, 3 * dl_)) * 0.05,
                         jnp.float32),
        bqkv=jnp.zeros(3 * dl_), wo=jnp.asarray(
            r10.standard_normal((dl_, dl_)) * 0.05, jnp.float32),
        bo=jnp.zeros(dl_), g1=jnp.ones(dl_), b1=jnp.zeros(dl_),
        w1=jnp.asarray(r10.standard_normal((dl_, ffl_)) * 0.05, jnp.float32),
        b1f=jnp.zeros(ffl_),
        w2=jnp.asarray(r10.standard_normal((ffl_, dl_)) * 0.05, jnp.float32),
        b2f=jnp.zeros(dl_), g2=jnp.ones(dl_), b2=jnp.zeros(dl_))
    # 384 rows → row tile 128: the rate>0 lm-width forward at tile 256
    # measured 16.77M scoped VMEM (> the 16M limit) on v5e
    x6f = jnp.asarray(np.random.default_rng(11).standard_normal((384, dl_)),
                      jnp.float32)
    f6 = jax.jit(lambda x, s: encoder_layer_train(
        x, *args6.values(), s, 0.16, hl_, T, False))
    ya = np.asarray(f6(x6f, jnp.asarray([3], jnp.int32)))
    yb = np.asarray(f6(x6f, jnp.asarray([3], jnp.int32)))
    yc = np.asarray(f6(x6f, jnp.asarray([4], jnp.int32)))
    assert np.array_equal(ya, yb) and not np.array_equal(ya, yc)
    print("hd-64 packed heads on hardware: ok")
    record["hd64_seeded_determinism"] = "ok"
    return record


if __name__ == "__main__":
    main()
