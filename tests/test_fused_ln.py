"""Fused dropout+add+LayerNorm kernel: forward/VJP correctness.

rate=0 paths run under the TPU-semantics interpreter on CPU and as the REAL
kernel on TPU; rate>0 paths need the real hardware PRNG (the interpreter
stubs it to zeros) and only run on TPU (also validated by
scripts/validate_fused_ln.py).

On-chip cost note (round-4 lesson): this file burned 4×2400 s through the
tunnel with the CPU-parity tests hardcoding interpret=True — the TPU
interpreter traces every Pallas op individually, and the resulting program
is pathological to compile remotely. On TPU the tests now run the real
kernel, with lane-aligned row counts (multiples of the kernel's 256-row
block avoid degenerate padding programs) and small shapes throughout; the
suite runner's per-test watchdog (tests/conftest.py) bounds any residual
wedge to minutes.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from transformergrooveinfilling_tpu.ops.fused_ln import (
    dropout_add_layernorm,
    dropout_add_layernorm_reference,
)

D = 256

# interpreter on CPU (no TPU PRNG primitives there); real kernel on TPU
INTERP = jax.default_backend() == "cpu"


def _data(rng, n=256):
    x = jnp.asarray(rng.standard_normal((n, D)), jnp.float32)
    y = jnp.asarray(rng.standard_normal((n, D)), jnp.float32)
    scale = jnp.asarray(rng.standard_normal(D) * 0.1 + 1.0, jnp.float32)
    bias = jnp.asarray(rng.standard_normal(D) * 0.1, jnp.float32)
    return x, y, scale, bias


def test_forward_rate0_matches_reference(rng):
    x, y, scale, bias = _data(rng)
    out = dropout_add_layernorm(x, y, scale, bias, jnp.int32(0), 0.0, INTERP)
    ref = dropout_add_layernorm_reference(x, y, scale, bias,
                                          jax.random.PRNGKey(0), 0.0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_grads_rate0_match_reference(rng):
    x, y, scale, bias = _data(rng, n=128)

    def loss_fused(x, y, s, b):
        return jnp.sum(jnp.sin(
            dropout_add_layernorm(x, y, s, b, jnp.int32(0), 0.0, INTERP)))

    def loss_ref(x, y, s, b):
        return jnp.sum(jnp.sin(dropout_add_layernorm_reference(
            x, y, s, b, jax.random.PRNGKey(0), 0.0)))

    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(x, y, scale, bias)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(x, y, scale, bias)
    for a, b, name in zip(g_fused, g_ref, ("dx", "dy", "dscale", "dbias")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-4, err_msg=name)


@pytest.mark.skipif(jax.default_backend() == "cpu",
                    reason="interpreter PRNG is stubbed; needs real TPU")
def test_dropout_statistics(rng):
    """Keep rate ≈ 1-rate; kept branch entries scaled by 1/(1-rate)."""
    x = jnp.zeros((256, D), jnp.float32)
    y = jnp.ones((256, D), jnp.float32)
    scale = jnp.ones((D,), jnp.float32)
    bias = jnp.zeros((D,), jnp.float32)
    rate = 0.4
    # bypass LN's normalization by inspecting a = x + dropout(y) via identity:
    # use the VJP's dy instead — dy is nonzero exactly at kept positions
    def s(x_, y_):
        return jnp.sum(dropout_add_layernorm(x_, y_, scale, bias,
                                             jnp.int32(7), rate, False))
    dy = jax.grad(s, argnums=1)(x, y)
    kept = np.asarray(dy != 0)
    assert abs(kept.mean() - (1 - rate)) < 0.02


@pytest.mark.skipif(jax.default_backend() == "cpu",
                    reason="interpreter PRNG is stubbed; needs real TPU")
def test_dropout_mask_deterministic_given_seed(rng):
    x, y, scale, bias = _data(rng, n=64)
    a = dropout_add_layernorm(x, y, scale, bias, jnp.int32(3), 0.3, False)
    b = dropout_add_layernorm(x, y, scale, bias, jnp.int32(3), 0.3, False)
    c = dropout_add_layernorm(x, y, scale, bias, jnp.int32(4), 0.3, False)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    assert not np.allclose(np.asarray(a), np.asarray(c))


@pytest.mark.skipif(jax.default_backend() == "cpu",
                    reason="interpreter PRNG is stubbed; needs real TPU")
def test_bwd_mask_matches_fwd_mask(rng):
    """The backward pass regenerates the same mask the forward used: for a
    linear probe of the output, finite differences along a kept coordinate
    match the analytic gradient."""
    x, y, scale, bias = _data(rng, n=8)
    seed = jnp.int32(11)
    rate = 0.5

    def f(y_):
        return jnp.sum(dropout_add_layernorm(x, y_, scale, bias, seed, rate,
                                             False) * 1.7)

    g = jax.grad(f)(y)
    eps = 1e-3
    idx = (3, 17)
    bump = y.at[idx].add(eps)
    fd = (f(bump) - f(y)) / eps
    np.testing.assert_allclose(float(fd), float(g[idx]), rtol=2e-2, atol=1e-3)
