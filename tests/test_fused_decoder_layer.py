"""Whole-decoder-layer fused kernel (ops/fused_decoder_layer.py), interpret
mode.

Rate=0 is exact on the interpreter (the PRNG is stubbed there, like the
other Pallas kernels); rate>0 keep statistics and the hardware PRNG paths
are validated on the real chip by scripts/validate_fused_layer.py
(docs/PERF.md pattern).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from transformergrooveinfilling_tpu.models.transformer import (
    DecoderLayer, GrooveTransformerConfig, GrooveTransformer,
)

D, H, FF, T, B = 256, 2, 512, 32, 4  # flagship-shaped, small batch


def _layer(fused, d=D, h=H, ff=FF):
    return DecoderLayer(d, h, ff, 0.0, fused_layer=fused)


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, T, D)), jnp.float32)
    mem = jnp.asarray(rng.standard_normal((B, T, D)), jnp.float32)
    params = _layer(False).init(jax.random.PRNGKey(0), x, mem,
                                deterministic=True)["params"]
    return x, mem, params


def test_param_tree_identical(setup):
    x, mem, params = setup
    fused_params = _layer(True).init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        x, mem, deterministic=False)["params"]
    ref = jax.tree.map(lambda a: (a.shape, a.dtype), params)
    got = jax.tree.map(lambda a: (a.shape, a.dtype), fused_params)
    assert ref == got


def test_forward_parity_rate0(setup):
    x, mem, params = setup
    key = {"dropout": jax.random.PRNGKey(3)}
    y_ref = _layer(False).apply({"params": params}, x, mem,
                                deterministic=False, rngs=key)
    y_fused = _layer(True).apply({"params": params}, x, mem,
                                 deterministic=False, rngs=key)
    np.testing.assert_allclose(np.asarray(y_fused), np.asarray(y_ref),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("d,h,ff", [(256, 2, 512), (256, 4, 512)])
def test_grad_parity_rate0(setup, d, h, ff):
    """Every gradient — params, target activations AND encoder memory (the
    dmem output unique to the decoder kernel) — must match the unfused XLA
    path at rate 0, for both the direct-slice (hd 128) and lane-group-packed
    (hd 64) head widths."""
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((B, T, d)), jnp.float32)
    mem = jnp.asarray(rng.standard_normal((B, T, d)), jnp.float32)
    params = _layer(False, d, h, ff).init(
        jax.random.PRNGKey(0), x, mem, deterministic=True)["params"]
    key = {"dropout": jax.random.PRNGKey(3)}

    def loss(fused, params, x, mem):
        y = _layer(fused, d, h, ff).apply(
            {"params": params}, x, mem, deterministic=False, rngs=key)
        w = jnp.arange(y.size, dtype=jnp.float32).reshape(y.shape) / y.size
        return jnp.sum(y * w)

    g_ref = jax.grad(loss, argnums=(1, 2, 3))(False, params, x, mem)
    g_fused = jax.grad(loss, argnums=(1, 2, 3))(True, params, x, mem)
    flat_ref = jax.tree_util.tree_leaves_with_path(g_ref)
    flat_fused = jax.tree.leaves(g_fused)
    assert len(flat_ref) == len(flat_fused)
    for (path, r), f in zip(flat_ref, flat_fused):
        np.testing.assert_allclose(
            np.asarray(f), np.asarray(r), rtol=5e-3, atol=5e-4,
            err_msg=f"grad mismatch at {jax.tree_util.keystr(path)}")


def test_full_model_parity_rate0():
    """The enc-dec family end-to-end with fused_layer on: encoder layers
    take the encoder kernel, decoder layers the decoder kernel, and the
    output must match the unfused model at rate 0 (same param tree)."""
    import dataclasses

    cfg = GrooveTransformerConfig(
        d_model=256, n_heads=2, dim_feedforward=512, dropout=0.0,
        num_encoder_layers=1, num_decoder_layers=1,
        embedding_size_src=16, embedding_size_tgt=27, fused_layer=True,
        fused_decoder_layer=True)
    rng = np.random.default_rng(2)
    src = jnp.asarray(rng.standard_normal((B, T, 16)), jnp.float32)
    tgt = jnp.asarray(rng.random((B, T, 27)), jnp.float32)

    plain = GrooveTransformer(dataclasses.replace(
        cfg, fused_layer=False, fused_decoder_layer=False))
    fused = GrooveTransformer(cfg)
    params = plain.init(jax.random.PRNGKey(0), src, tgt,
                        deterministic=True)["params"]
    key = {"dropout": jax.random.PRNGKey(5)}
    y_ref = plain.apply({"params": params}, src, tgt, deterministic=False,
                        rngs=key)
    y_fused = fused.apply({"params": params}, src, tgt, deterministic=False,
                          rngs=key)
    for a, b in zip(jax.tree.leaves(y_ref), jax.tree.leaves(y_fused)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-4, atol=2e-4)
