#!/usr/bin/env python
"""On-TPU validation of the fused FFN kernel (ops/fused_ffn.py) — the rate>0
PRNG paths the interpret-mode tests cannot reach.

Checks (same discipline as validate_fused_layer.py):
1. rate=0 forward parity vs the XLA composite, resident AND tiled layouts.
2. keep-rate statistics: with W2=I-ish readout the hidden dropout mask is
   observable through ffn_train's output sparsity pattern; we instead probe
   the gradient wrt b1 (nonzero exactly where h_drop > 0 — mask AND ReLU).
3. seeded determinism (same seed bit-identical, cross-seed differs).
4. fwd/bwd consistency at rate>0 via directional finite differences (the
   backward reconstructs the mask from the stored h_drop, so this pins the
   h_drop-based reconstruction).

``main()`` returns a machine-readable record; ``validate_kernels_json.py``
writes docs/fused_kernel_validation.json.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import transformergrooveinfilling_tpu  # noqa: F401,E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from transformergrooveinfilling_tpu.ops.dropout import (  # noqa: E402
    quantized_keep_rate)
from transformergrooveinfilling_tpu.ops.fused_ffn import (  # noqa: E402
    ffn_train, fits_resident)


def _args(d, ff, seed=0):
    r = np.random.default_rng(seed)
    return (jnp.asarray(r.standard_normal((d, ff)) * 0.05, jnp.float32),
            jnp.asarray(r.standard_normal(ff) * 0.01, jnp.float32),
            jnp.asarray(r.standard_normal((ff, d)) * 0.05, jnp.float32),
            jnp.asarray(r.standard_normal(d) * 0.01, jnp.float32))


def _composite(x, w1, b1, w2, b2):
    return jnp.maximum(x @ w1 + b1, 0.0) @ w2 + b2


def _validate_width(d, ff, record):
    layout = "resident" if fits_resident(d, ff, 4) else "tiled"
    rng = np.random.default_rng(3)
    # 256 rows → row tile 256: at m=512 the kernel picks a 512-row tile and
    # the rate>0 resident-ff2048 forward's scratch measured 17.13M scoped
    # VMEM (> the 16M limit) on v5e
    m = 256
    x = jnp.asarray(rng.standard_normal((m, d)), jnp.float32)
    w1, b1, w2, b2 = _args(d, ff)
    seed = jnp.asarray([5], jnp.int32)

    # 1. rate=0 parity — BOTH arms under highest matmul precision: the XLA
    # composite's default bf16 passes alone measured 1.9 % max rel on v5e
    # (the same precision trap check 4 documents), which says nothing about
    # the kernel. 128 rows for this block only: the f32 multi-pass forward
    # at 512 rows measured 25.2M scoped VMEM (> the 16M limit) on v5e.
    x_par = x[:128]
    with jax.default_matmul_precision("highest"):
        y0 = np.asarray(ffn_train(x_par, w1, b1, w2, b2, seed, 0.0))
        yr = np.asarray(_composite(x_par, w1, b1, w2, b2))
    rel = float(np.max(np.abs(y0 - yr) / (np.abs(yr) + 1e-2)))
    print(f"[{layout} d{d}/ff{ff}] rate=0 parity: max rel {rel:.5f}")
    assert rel < 5e-3

    # 2. keep rate through a counting readout: w1 = 0, b1 = +1 makes the
    # hidden all-ones (ReLU everywhere-active), so h_drop ∈ {0, 1/keep_q};
    # a W2 column of ones then reads out (#kept in row)/keep_q, and
    # keep fraction = mean(out)·keep_q/ff.
    rate = 0.3
    probe_w1 = jnp.zeros_like(w1)
    probe_b1 = jnp.ones_like(b1)
    w2_probe = jnp.zeros_like(w2).at[:, 0].set(1.0)
    h_out = np.asarray(ffn_train(x, probe_w1, probe_b1, w2_probe,
                                 jnp.zeros_like(b2), seed, rate))[:, 0]
    keep_q = float(quantized_keep_rate(rate))
    keep_obs = float(np.mean(h_out) * keep_q / ff)
    print(f"[{layout}] keep rate @ {rate}: {keep_obs:.4f} "
          f"(quantized target {keep_q:.4f})")
    record_entry = {"layout": layout, "d": d, "ff": ff,
                    "rate0_max_rel": rel,
                    "keep_rate": {"rate": rate, "observed": keep_obs,
                                  "quantized_target": keep_q, "seed": 5}}
    assert abs(keep_obs - keep_q) < 0.01

    # 3. seeded determinism
    f = jax.jit(lambda x, s: ffn_train(x, w1, b1, w2, b2, s, rate))
    a = np.asarray(f(x, seed))
    b = np.asarray(f(x, seed))
    c = np.asarray(f(x, jnp.asarray([6], jnp.int32)))
    assert np.array_equal(a, b) and not np.array_equal(a, c)
    record_entry["seeded_determinism"] = (
        "same-seed bit-identical, cross-seed differs")
    print(f"[{layout}] seeded determinism: ok")

    # 4. fwd/bwd consistency at rate>0, directional finite differences under
    # highest matmul precision (default bf16 passes drown the quotient —
    # see validate_fused_layer.py check 4's derivation)
    # 128 rows: the f32 multi-pass backward at these widths exceeds scoped
    # VMEM at 512 rows (same bound as check 1)
    m4 = 128
    x4 = x[:m4]
    with jax.default_matmul_precision("highest"):
        u = jnp.asarray(np.random.default_rng(13).standard_normal((m4, d)),
                        jnp.float32)

        def floss(x_, s):
            return jnp.sum(ffn_train(x_, w1, b1, w2, b2, s, rate) * u)

        g = np.asarray(jax.grad(floss)(x4, seed), np.float64)
        # negative control: the same vjp under a WRONG seed must disagree
        # with the fd quotient much harder than the right seed does — that
        # is what separates "mask-consistent backward" from fd noise
        g_wrong = np.asarray(jax.grad(floss)(
            x4, jnp.asarray([99], jnp.int32)), np.float64)
        rng4 = np.random.default_rng(17)
        eps, k = 1e-2, 6
        fds, ans, ans_wrong = [], [], []
        for _ in range(k):
            e = rng4.standard_normal((m4, d)).astype(np.float32)
            fp = float(floss(x4 + eps * jnp.asarray(e), seed))
            fm = float(floss(x4 - eps * jnp.asarray(e), seed))
            fds.append((fp - fm) / (2 * eps))
            ans.append(float(np.vdot(g, e.astype(np.float64))))
            ans_wrong.append(float(np.vdot(g_wrong, e.astype(np.float64))))
    fds, ans = np.array(fds), np.array(ans)
    relg = float(np.linalg.norm(fds - ans) / np.linalg.norm(ans))
    relw = float(np.linalg.norm(fds - np.array(ans_wrong))
                 / np.linalg.norm(ans_wrong))
    print(f"[{layout}] fwd/bwd consistency: rel residual {relg:.4f} "
          f"(wrong-seed control {relw:.4f})")
    record_entry["fwd_bwd_rel_residual"] = relg
    record_entry["fwd_bwd_wrong_seed_residual"] = relw
    # f32 fd quotients at these widths carry ~0.1 of cancellation noise
    # (measured 0.129 on v5e with a consistent backward); the wrong-seed
    # control keeps the check discriminating
    assert relg < 0.2 and relw > 2 * relg
    record.append(record_entry)


def main():
    assert jax.default_backend() == "tpu", "hardware validation needs a chip"
    widths = []
    _validate_width(256, 2048, widths)   # resident layout (lm config)
    _validate_width(1024, 4096, widths)  # K/F-tiled layout (GrooveXL)
    print("ALL OK")
    return {"kernel": "fused_ffn", "widths": widths}


if __name__ == "__main__":
    main()
