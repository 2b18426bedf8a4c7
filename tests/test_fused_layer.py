"""Whole-encoder-layer fused kernel (ops/fused_layer.py), interpret mode.

Rate=0 is exact on the interpreter (the PRNG is stubbed there, like the
other Pallas kernels); rate>0 keep statistics are validated on hardware by
scripts/validate_fused_layer.py (docs/PERF.md pattern).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from transformergrooveinfilling_tpu.models.transformer import (
    EncoderLayer, GrooveTransformerConfig,
)
from transformergrooveinfilling_tpu.ops.fused_layer import (
    encoder_layer_train, pick_layer_tile, supports_fused_layer,
)

D, H, FF, T, B = 256, 2, 512, 32, 8  # flagship-shaped, small batch


def _layer(fused):
    return EncoderLayer(D, H, FF, 0.0, fused_layer=fused)


@pytest.fixture(scope="module")
def setup():
    x = jnp.asarray(np.random.default_rng(0).standard_normal((B, T, D)),
                    jnp.float32)
    params = _layer(False).init(jax.random.PRNGKey(0), x,
                                deterministic=True)["params"]
    return x, params


def test_param_tree_identical(setup):
    x, params = setup
    fused_params = _layer(True).init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        x, deterministic=False)["params"]
    ref = jax.tree.map(lambda a: (a.shape, a.dtype), params)
    got = jax.tree.map(lambda a: (a.shape, a.dtype), fused_params)
    assert ref == got


def test_forward_parity_rate0(setup):
    x, params = setup
    key = {"dropout": jax.random.PRNGKey(3)}
    y_ref = _layer(False).apply({"params": params}, x, deterministic=False,
                                rngs=key)
    y_fused = _layer(True).apply({"params": params}, x, deterministic=False,
                                 rngs=key)
    np.testing.assert_allclose(np.asarray(y_fused), np.asarray(y_ref),
                               rtol=2e-4, atol=2e-4)


def test_grad_parity_rate0(setup):
    x, params = setup
    key = {"dropout": jax.random.PRNGKey(3)}

    def loss(fused, params, x):
        y = _layer(fused).apply({"params": params}, x, deterministic=False,
                                rngs=key)
        # non-uniform weighting so every grad component is exercised
        w = jnp.arange(y.size, dtype=jnp.float32).reshape(y.shape) / y.size
        return jnp.sum(y * w)

    g_ref = jax.grad(loss, argnums=(1, 2))(False, params, x)
    g_fused = jax.grad(loss, argnums=(1, 2))(True, params, x)
    flat_ref = jax.tree_util.tree_leaves_with_path(g_ref)
    flat_fused = jax.tree.leaves(g_fused)
    assert len(flat_ref) == len(flat_fused)
    for (path, r), f in zip(flat_ref, flat_fused):
        np.testing.assert_allclose(
            np.asarray(f), np.asarray(r), rtol=5e-3, atol=5e-4,
            err_msg=f"grad mismatch at {jax.tree_util.keystr(path)}")


def test_kernel_rate0_matches_manual():
    """Direct kernel check against a plain-jnp composition of the layer."""
    rng = np.random.default_rng(1)
    m = 128
    x = jnp.asarray(rng.standard_normal((m, D)), jnp.float32)
    wqkv = jnp.asarray(rng.standard_normal((D, 3 * D)) * 0.05, jnp.float32)
    bqkv = jnp.asarray(rng.standard_normal(3 * D) * 0.01, jnp.float32)
    wo = jnp.asarray(rng.standard_normal((D, D)) * 0.05, jnp.float32)
    bo = jnp.asarray(rng.standard_normal(D) * 0.01, jnp.float32)
    g1 = jnp.asarray(1 + 0.1 * rng.standard_normal(D), jnp.float32)
    b1 = jnp.asarray(0.1 * rng.standard_normal(D), jnp.float32)
    w1 = jnp.asarray(rng.standard_normal((D, FF)) * 0.05, jnp.float32)
    b1f = jnp.asarray(rng.standard_normal(FF) * 0.01, jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((FF, D)) * 0.05, jnp.float32)
    b2f = jnp.asarray(rng.standard_normal(D) * 0.01, jnp.float32)
    g2 = jnp.asarray(1 + 0.1 * rng.standard_normal(D), jnp.float32)
    b2 = jnp.asarray(0.1 * rng.standard_normal(D), jnp.float32)
    seed = jnp.zeros((1,), jnp.int32)

    y = encoder_layer_train(x, wqkv, bqkv, wo, bo, g1, b1, w1, b1f, w2, b2f,
                            g2, b2, seed, 0.0, H, T, True)

    def ln(a, g, b):
        a = a.astype(jnp.float32)
        mu = a.mean(-1, keepdims=True)
        var = a.var(-1, keepdims=True)
        return (a - mu) / jnp.sqrt(var + 1e-5) * g + b

    hd = D // H
    qkv = x @ wqkv + bqkv
    seqs = x.reshape(-1, T, D)
    q, k, v = [qkv.reshape(-1, T, 3 * D)[..., i * D:(i + 1) * D]
               for i in range(3)]
    parts = []
    for hh in range(H):
        qs = q[..., hh * hd:(hh + 1) * hd]
        ks = k[..., hh * hd:(hh + 1) * hd]
        vs = v[..., hh * hd:(hh + 1) * hd]
        s = jnp.einsum("bqd,bkd->bqk", qs, ks) / np.sqrt(hd)
        parts.append(jnp.einsum("bqk,bkd->bqd", jax.nn.softmax(s, -1), vs))
    attn = jnp.concatenate(parts, -1).reshape(-1, D)
    a1 = x + (attn @ wo + bo)
    y1 = ln(a1, g1, b1)
    hseq = jax.nn.relu(y1 @ w1 + b1f)
    a2 = y1 + (hseq @ w2 + b2f)
    y_ref = ln(a2, g2, b2)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=2e-4, atol=2e-4)


def test_shape_gate():
    assert supports_fused_layer(256, 2, 512, 4096, 32)
    assert supports_fused_layer(256, 4, 1024, 4096, 32)      # hd 64, packed
    # ff2048: the f32 backward exceeds the 16M scoped-VMEM limit at
    # every row tile (measured v5e compile-time OOM) — gate rejects
    assert not supports_fused_layer(256, 4, 2048, 4096, 32)
    assert supports_fused_layer(128, 2, 512, 4096, 32)       # hd 64, packed
    assert not supports_fused_layer(256, 3, 512, 4096, 32)   # hd 85, no slice
    assert not supports_fused_layer(128, 4, 512, 4096, 32)   # hd 32 unsupported
    assert not supports_fused_layer(200, 2, 512, 4096, 32)   # d not 128-mult
    assert not supports_fused_layer(256, 2, 512, 96, 32)     # no legal tile
    assert pick_layer_tile(4096, 32) == 256
    assert pick_layer_tile(128, 32) == 128
    assert pick_layer_tile(96, 32) is None


def test_forward_and_grad_parity_rate0_packed_heads():
    """hd-64 lane-group packing (the lm config shape d256/h4/ff2048): the
    fused layer must reproduce the unfused XLA path's forward and every
    gradient at rate 0 — the packed matmuls' zeroed lanes must neither leak
    cross-head terms nor drop head contributions."""
    d, h, ff = 256, 4, 1024  # ff capped by the gate's VMEM envelope
    x = jnp.asarray(np.random.default_rng(4).standard_normal((4, T, d)),
                    jnp.float32)
    layer = lambda fused: EncoderLayer(d, h, ff, 0.0, fused_layer=fused)
    params = layer(False).init(jax.random.PRNGKey(0), x,
                               deterministic=True)["params"]
    key = {"dropout": jax.random.PRNGKey(3)}

    def loss(fused, params, x):
        y = layer(fused).apply({"params": params}, x, deterministic=False,
                               rngs=key)
        w = jnp.arange(y.size, dtype=jnp.float32).reshape(y.shape) / y.size
        return jnp.sum(y * w), y

    (l_ref, y_ref), g_ref = jax.value_and_grad(
        loss, argnums=(1, 2), has_aux=True)(False, params, x)
    (l_fused, y_fused), g_fused = jax.value_and_grad(
        loss, argnums=(1, 2), has_aux=True)(True, params, x)
    np.testing.assert_allclose(np.asarray(y_fused), np.asarray(y_ref),
                               rtol=2e-4, atol=2e-4)
    flat_ref = jax.tree_util.tree_leaves_with_path(g_ref)
    flat_fused = jax.tree.leaves(g_fused)
    assert len(flat_ref) == len(flat_fused)
    for (path, r), f in zip(flat_ref, flat_fused):
        np.testing.assert_allclose(
            np.asarray(f), np.asarray(r), rtol=5e-3, atol=5e-4,
            err_msg=f"grad mismatch at {jax.tree_util.keystr(path)}")


@pytest.mark.skipif(jax.default_backend() != "cpu",
                    reason="CPU-interpreter premise: the stub-PRNG "
                    "keep-everything semantics this test pins hold only in "
                    "the host interpreter; rate>0 grads on hardware are "
                    "validated by the real-kernel tests above and "
                    "docs/fused_kernel_validation.json")
def test_interpret_rate_positive_consistent_grads():
    """Interpret mode keeps everything at rate>0 (stubbed PRNG) but must be
    SELF-consistent between forward and backward: grads of the scaled-keep
    function match finite differences."""
    rng = np.random.default_rng(2)
    m = 128
    x = jnp.asarray(rng.standard_normal((m, D)), jnp.float32)
    args = dict(
        wqkv=jnp.asarray(rng.standard_normal((D, 3 * D)) * 0.05, jnp.float32),
        bqkv=jnp.zeros(3 * D), wo=jnp.asarray(
            rng.standard_normal((D, D)) * 0.05, jnp.float32),
        bo=jnp.zeros(D), g1=jnp.ones(D), b1=jnp.zeros(D),
        w1=jnp.asarray(rng.standard_normal((D, FF)) * 0.05, jnp.float32),
        b1f=jnp.zeros(FF),
        w2=jnp.asarray(rng.standard_normal((FF, D)) * 0.05, jnp.float32),
        b2f=jnp.zeros(D), g2=jnp.ones(D), b2=jnp.zeros(D))
    seed = jnp.zeros((1,), jnp.int32)

    def f(x):
        return jnp.sum(encoder_layer_train(
            x, *args.values(), seed, 0.3, H, T, True) ** 2)

    g = jax.grad(f)(x)
    eps = 1e-3
    probe = np.zeros((m, D), np.float32)
    probe[5, 17] = 1.0
    probe = jnp.asarray(probe)
    fd = (f(x + eps * probe) - f(x - eps * probe)) / (2 * eps)
    np.testing.assert_allclose(float(jnp.vdot(g, probe)), float(fd),
                               rtol=2e-2, atol=1e-3)
