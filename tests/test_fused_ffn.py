"""ops/fused_ffn.py — the fused FFN training kernel (opt-in; docs/PERF.md).

CPU tests run the kernel in interpreter mode, where the hardware PRNG is
unavailable: rate=0 paths are pinned exactly (forward AND the custom VJP
against jax.grad of the XLA composition); rate>0 determinism/unbiasedness are
validated on hardware (same split as the other PRNG kernels)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from transformergrooveinfilling_tpu.ops.fused_ffn import ffn_train


@pytest.fixture
def operands(rng):
    M, K, F = 64, 128, 256
    x = jnp.asarray(rng.standard_normal((M, K)), jnp.float32)
    w1 = jnp.asarray(rng.standard_normal((K, F)) * 0.1, jnp.float32)
    b1 = jnp.asarray(rng.standard_normal(F) * 0.1, jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((F, K)) * 0.1, jnp.float32)
    b2 = jnp.asarray(rng.standard_normal(K) * 0.1, jnp.float32)
    return x, w1, b1, w2, b2


def _ref(x, w1, b1, w2, b2):
    return jax.nn.relu(x @ w1 + b1) @ w2 + b2


def test_forward_rate0_exact(operands):
    seed = jnp.zeros((1,), jnp.int32)
    out = ffn_train(*operands, seed, 0.0, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(_ref(*operands)),
                               rtol=1e-5, atol=1e-5)


def test_custom_vjp_matches_autodiff(operands):
    seed = jnp.zeros((1,), jnp.int32)

    def loss_fused(args):
        return (ffn_train(*args, seed, 0.0, True) ** 2).sum()

    def loss_ref(args):
        return (_ref(*args) ** 2).sum()

    g1 = jax.grad(loss_fused)(operands)
    g2 = jax.grad(loss_ref)(operands)
    for a, b, name in zip(g1, g2, ("x", "w1", "b1", "w2", "b2")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4, err_msg=name)


def test_model_flag_shares_checkpoint_tree(rng):
    """fused_ffn=True creates the exact same parameter tree (linear1/linear2
    kernel+bias) as the nn.Dense path, so checkpoints are interchangeable;
    training-mode forward runs through the kernel without error."""
    from transformergrooveinfilling_tpu.models import build_model
    from transformergrooveinfilling_tpu.models.transformer import (
        GrooveTransformerConfig,
    )

    x = jnp.asarray(rng.standard_normal((2, 32, 16)), jnp.float32)
    cfg_plain = GrooveTransformerConfig(
        d_model=128, n_heads=2, dim_feedforward=128, dropout=0.2,
        num_encoder_layers=1)
    cfg_fused = GrooveTransformerConfig(
        d_model=128, n_heads=2, dim_feedforward=128, dropout=0.2,
        num_encoder_layers=1, fused_ffn=True)
    m_plain, m_fused = build_model(cfg_plain), build_model(cfg_fused)
    params = m_plain.init(jax.random.PRNGKey(0), x)["params"]

    def paths(tree):
        return sorted("/".join(str(k.key) for k in kp)
                      for kp, _ in jax.tree_util.tree_flatten_with_path(tree)[0])

    params_f = m_fused.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        x, deterministic=False)["params"]
    assert paths(params) == paths(params_f)
    # deterministic forward bypasses the kernel → identical to the plain model
    a = m_plain.apply({"params": params}, x, deterministic=True)
    b = m_fused.apply({"params": params}, x, deterministic=True)
    for pa, pb in zip(a, b):
        np.testing.assert_array_equal(np.asarray(pa), np.asarray(pb))
    # training forward runs the kernel (interpret mode on CPU: mask ≡ keep);
    # finite output and gradient
    def loss(p):
        h, v, o = m_fused.apply({"params": p}, x, deterministic=False,
                                rngs={"dropout": jax.random.PRNGKey(2)})
        return (h ** 2).mean() + (v ** 2).mean() + (o ** 2).mean()

    val, grads = jax.value_and_grad(loss)(params)
    assert np.isfinite(float(val))
    assert all(np.isfinite(np.asarray(g)).all() for g in jax.tree.leaves(grads))


def test_rows_not_divisible_by_8_rejected(operands):
    x, w1, b1, w2, b2 = operands
    with pytest.raises(ValueError, match="not divisible"):
        ffn_train(x[:9], w1, b1, w2, b2, jnp.zeros((1,), jnp.int32), 0.0, True)


@pytest.fixture
def big_operands(rng):
    # weights past the VMEM-resident budget -> the K/F-tiled kernel path
    # (small K but F wide enough that 2*K*F*4B > 4 MiB at f32)
    M, K, F = 64, 1024, 1024
    x = jnp.asarray(rng.standard_normal((M, K)), jnp.float32)
    w1 = jnp.asarray(rng.standard_normal((K, F)) * 0.03, jnp.float32)
    b1 = jnp.asarray(rng.standard_normal(F) * 0.1, jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((F, K)) * 0.03, jnp.float32)
    b2 = jnp.asarray(rng.standard_normal(K) * 0.1, jnp.float32)
    return x, w1, b1, w2, b2


def test_tiled_forward_rate0_exact(big_operands):
    """GrooveXL-class widths route through the K/F-tiled kernel (weights
    streamed per ff slab, f32 out accumulator revisited across the sweep)
    and match the XLA composition exactly at rate 0."""
    from transformergrooveinfilling_tpu.ops.fused_ffn import (
        _RESIDENT_WEIGHT_BYTES)

    x, w1, *_ = big_operands
    assert 2 * w1.shape[0] * w1.shape[1] * 4 > _RESIDENT_WEIGHT_BYTES
    seed = jnp.zeros((1,), jnp.int32)
    out = ffn_train(*big_operands, seed, 0.0, True)
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(_ref(*big_operands)),
                               rtol=2e-4, atol=2e-4)


def test_tiled_custom_vjp_matches_autodiff(big_operands):
    seed = jnp.zeros((1,), jnp.int32)

    def loss_fused(args):
        return (ffn_train(*args, seed, 0.0, True) ** 2).sum()

    def loss_ref(args):
        return (_ref(*args) ** 2).sum()

    g1 = jax.grad(loss_fused)(big_operands)
    g2 = jax.grad(loss_ref)(big_operands)
    for a, b, name in zip(g1, g2, ("x", "w1", "b1", "w2", "b2")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=3e-3, atol=3e-3, err_msg=name)


def test_resolve_fused_ffn_auto_boundary(monkeypatch):
    """Auto mode enables the kernel only in its measured win region: TPU
    backend, ff >= 2048, AND weights small enough for the VMEM-resident
    layout (docs/PERF.md round 3: +16 % at d256/ff2048, negative at the
    flagship's ff 512 and at tiled GrooveXL widths d1024/ff4096)."""
    import jax

    from transformergrooveinfilling_tpu.train.config import resolve_fused_ffn

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    assert resolve_fused_ffn(None, 2048, 256) is True
    assert resolve_fused_ffn(None, 512, 256) is False      # below crossover
    assert resolve_fused_ffn(None, 4096, 1024) is False    # tiled regime
    assert resolve_fused_ffn(True, 4096, 1024) is True     # explicit override
    assert resolve_fused_ffn(False, 2048, 256) is False
    # residency is judged at the compute dtype the kernel will see: bf16 off
    # doubles the weight bytes, pushing d256/ff4096 into the tiled regime
    assert resolve_fused_ffn(None, 4096, 256, jnp.bfloat16) is True
    assert resolve_fused_ffn(None, 4096, 256, jnp.float32) is False
    monkeypatch.setattr(jax, "default_backend", lambda: "cpu")
    assert resolve_fused_ffn(None, 2048, 256) is False     # TPU-only auto
