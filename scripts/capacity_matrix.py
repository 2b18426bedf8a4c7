"""Measured capacity argument for the pipeline-parallelism matrix (docs/PERF.md).

AOT-compiles ONE training step (forward + grads + SGD update, bf16 compute)
for escalating model sizes on the real TPU backend and records XLA's memory
analysis — peak HBM = arguments + outputs + temporaries. Nothing executes,
so the probe is cheap and safe on a tunneled chip.

The numbers close the two driver refusals with data
(train/driver.py: multi-process pipeline, encoder-decoder pipeline):
if the encoder-decoder family at 4x GrooveXL fits ONE chip, pipeline
parallelism has no target workload in this model family and the supported
alternative (dp / dp x tp) is the right answer, not a bigger pp matrix.

Writes docs/capacity_matrix.json and prints a markdown table for PERF.md.

Usage:  python scripts/capacity_matrix.py            (real chip via axon)
        TGI_PLATFORM=cpu python scripts/capacity_matrix.py   (CPU smoke)
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import transformergrooveinfilling_tpu  # noqa: F401  (applies TGI_PLATFORM)
import jax
import jax.numpy as jnp
import numpy as np

from transformergrooveinfilling_tpu.models import build_model
from transformergrooveinfilling_tpu.models.transformer import (
    GrooveTransformerConfig,
)
from transformergrooveinfilling_tpu.train.loop import (
    create_train_state, make_optimizer, make_train_step,
)

GIB = 1024 ** 3

# (label, config, batch) — flagship enc-dec is the largest SHIPPED size
# (configs/*.yaml); GrooveXL is the scaling probe (docs/PERF.md); 4x GrooveXL
# is the capacity headroom point the refusal message cites.
CASES = [
    ("enc-dec flagship d256/ff512 6+6L bs512",
     dict(d_model=256, n_heads=2, dim_feedforward=512,
          num_encoder_layers=6, num_decoder_layers=6), 512, False),
    ("enc-dec GrooveXL d1024/ff4096 12+12L bs128",
     dict(d_model=1024, n_heads=8, dim_feedforward=4096,
          num_encoder_layers=12, num_decoder_layers=12), 128, False),
    ("enc-dec 4x GrooveXL d2048/ff8192 12+12L bs128",
     dict(d_model=2048, n_heads=16, dim_feedforward=8192,
          num_encoder_layers=12, num_decoder_layers=12), 128, False),
    ("enc-dec 4x GrooveXL d2048/ff8192 12+12L bs128 (remat)",
     dict(d_model=2048, n_heads=16, dim_feedforward=8192,
          num_encoder_layers=12, num_decoder_layers=12), 128, True),
    ("enc-dec 4x GrooveXL d2048/ff8192 12+12L bs32 (production batch)",
     dict(d_model=2048, n_heads=16, dim_feedforward=8192,
          num_encoder_layers=12, num_decoder_layers=12), 32, False),
    ("enc-only 4x GrooveXL d2048/ff8192 12L bs128",
     dict(d_model=2048, n_heads=16, dim_feedforward=8192,
          num_encoder_layers=12, num_decoder_layers=0), 128, False),
]


def measure(label: str, overrides: dict, batch: int, remat: bool) -> dict:
    cfg = GrooveTransformerConfig(
        dropout=0.1, max_len=32, embedding_size_src=16,
        embedding_size_tgt=27, compute_dtype=jnp.bfloat16, remat=remat,
        **overrides)
    model = build_model(cfg)
    tx = make_optimizer("sgd", 0.05)
    state = create_train_state(model, cfg, tx, jax.random.PRNGKey(0))
    step = make_train_step(model, tx, 0.5, encoder_only=cfg.encoder_only)
    x = jax.ShapeDtypeStruct((batch, cfg.max_len, cfg.embedding_size_src),
                             jnp.float32)
    y = jax.ShapeDtypeStruct((batch, cfg.max_len, cfg.embedding_size_tgt),
                             jnp.float32)
    w = jax.ShapeDtypeStruct((batch,), jnp.float32)
    key = jax.ShapeDtypeStruct((2,), jnp.uint32)
    shapes = jax.eval_shape(lambda s: s, state)  # state as abstract tree
    compiled = jax.jit(step, donate_argnums=(0,)).lower(
        shapes, x, y, w, key).compile()
    mem = compiled.memory_analysis()
    n_params = sum(int(np.prod(p.shape))
                   for p in jax.tree.leaves(state.params))
    out = {
        "label": label,
        "params_millions": round(n_params / 1e6, 1),
        "batch": batch,
        "remat": remat,
        "argument_gib": round(mem.argument_size_in_bytes / GIB, 3),
        "output_gib": round(mem.output_size_in_bytes / GIB, 3),
        "temp_gib": round(mem.temp_size_in_bytes / GIB, 3),
        "peak_gib": round((mem.argument_size_in_bytes
                           + mem.output_size_in_bytes
                           + mem.temp_size_in_bytes
                           - mem.alias_size_in_bytes) / GIB, 3),
        "alias_gib": round(mem.alias_size_in_bytes / GIB, 3),
    }
    del compiled, state
    return out


def main():
    dev = jax.devices()[0]
    rows = []
    for label, overrides, batch, remat in CASES:
        try:
            rows.append(measure(label, overrides, batch, remat))
            print(f"  ok: {rows[-1]}", flush=True)
        except Exception as e:  # OOM at compile time is itself the datum
            rows.append({"label": label, "batch": batch, "remat": remat,
                         "error": str(e)[:300]})
            print(f"  FAILED: {label}: {e}", flush=True)
    result = {"device_kind": dev.device_kind, "platform": dev.platform,
              "note": ("XLA AOT memory_analysis of one donated train step "
                       "(fwd+bwd+SGD), bf16 compute; peak = args + outputs "
                       "+ temps - donated aliases"),
              "rows": rows}
    out_path = os.path.join(os.path.dirname(__file__), "..", "docs",
                            "capacity_matrix.json")
    with open(out_path, "w") as f:
        json.dump(result, f, indent=1)
    print(f"\nwrote {os.path.normpath(out_path)}")
    print("\n| config | params (M) | peak HBM (GiB) |")
    print("|---|---|---|")
    for r in rows:
        peak = r.get("peak_gib", "compile failed")
        print(f"| {r['label']} | {r.get('params_millions', '?')} | {peak} |")


if __name__ == "__main__":
    main()
