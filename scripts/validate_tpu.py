#!/usr/bin/env python
"""All TPU-hardware-only validations in one entry point (the CPU test suite
covers everything else; these need the real chip — hardware PRNG, Mosaic
compile, device latency).

Run: python scripts/validate_tpu.py
"""
import os
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def section(name):
    print(f"\n=== {name} ===", flush=True)


def main():
    import jax, jax.numpy as jnp
    print("backend:", jax.default_backend(), jax.devices())

    section("Pallas fused attention ≡ einsum (compiled)")
    from transformergrooveinfilling_tpu.ops.attention import fused_mha, mha_reference
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((2, 2, 32, 128)), jnp.float32)
    diff = float(jnp.max(jnp.abs(fused_mha(q, q, q) - mha_reference(q, q, q))))
    print("max diff:", diff)
    assert diff < 1e-5

    section("Pallas MSO band energies vs rFFT")
    from transformergrooveinfilling_tpu.ops.mso import MSOParams, log_frequency_filterbank
    from transformergrooveinfilling_tpu.ops.mso_pallas import (
        band_energies_pallas, band_energies_reference)
    params = MSOParams()
    fb_t = jnp.asarray(log_frequency_filterbank(params).T)
    frames = jnp.asarray(rng.standard_normal((1280, 1024)), jnp.float32)
    out = band_energies_pallas(frames, fb_t)
    ref = band_energies_reference(frames, fb_t)
    rel = float(jnp.max(jnp.abs(out - ref) / (jnp.abs(ref) + 1e-3)))
    print("max rel diff:", rel, "(MXU bf16-pass bound, <=0.01 expected)")
    assert rel < 0.01

    section("fused dropout+add+LN (hardware PRNG)")
    rc = subprocess.run([sys.executable, "scripts/validate_fused_ln.py"]).returncode
    assert rc == 0

    section("device-side serve latency (B=1 flagship)")
    from transformergrooveinfilling_tpu.models import build_model
    from transformergrooveinfilling_tpu.models.transformer import GrooveTransformerConfig
    cfg = GrooveTransformerConfig(d_model=256, n_heads=2, dim_feedforward=512,
                                  dropout=0.3, num_encoder_layers=6,
                                  embedding_size_src=16)
    model = build_model(cfg)
    p = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 16)),
                   deterministic=True)["params"]
    N = 200
    @jax.jit
    def loop(p, x):
        def body(i, x):
            h, v, o = model.apply({"params": p}, x, deterministic=True)
            return jnp.concatenate([(jax.nn.sigmoid(h) > 0.5).astype(jnp.float32),
                                    v, o], -1)[..., :16]
        return jax.lax.fori_loop(0, N, body, x)
    x = jnp.zeros((1, 32, 16), jnp.float32)
    r = loop(p, x); float(np.asarray(r).sum())
    t0 = time.perf_counter(); r = loop(p, x); float(np.asarray(r).sum())
    ms = (time.perf_counter() - t0) / N * 1000
    print(f"{ms:.3f} ms per infill (target < 20 ms)")
    assert ms < 20

    section("exported artifact runs on the chip (cpu-host export → tpu)")
    import tempfile

    from transformergrooveinfilling_tpu.export import export_infill, load_infill
    art = os.path.join(tempfile.mkdtemp(), "m.tgix")
    export_infill(p, cfg, art, batch_sizes=(1, 8))  # platforms=(cpu, tpu)
    loaded = load_infill(art)
    xs = rng.standard_normal((3, 32, 16)).astype(np.float32)
    _h, v, o = model.apply({"params": p}, jnp.asarray(xs), deterministic=True)
    direct = np.concatenate([np.asarray(v), np.asarray(o)], axis=-1)
    got = loaded.predict(xs)
    vel_off = float(np.max(np.abs(got[..., 9:] - direct)))
    print("artifact vs direct max |Δ| (vel/off heads):", vel_off)
    assert vel_off < 1e-3  # loose bound for MXU matmul passes

    print("\nALL TPU VALIDATIONS OK")


if __name__ == "__main__":
    sys.exit(main())
