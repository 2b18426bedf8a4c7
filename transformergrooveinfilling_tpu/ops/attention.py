"""Fused multi-head attention (Pallas TPU kernel).

At T=32 the whole attention computation for one (batch, head) pair — Q·Kᵀ,
softmax, ·V — fits comfortably in VMEM, so the kernel runs it as a single fused
block per grid step: one MXU matmul chain with the softmax in registers, no HBM
round-trips for the (T, T) score matrix. The flagship config (d_model 256,
2 heads → head_dim 128) is exactly MXU/VPU tile-aligned.

Used on the inference path (serving); training keeps the XLA einsum path, whose
fusion at these sizes is already near-roofline and which autodiffs for free.
Falls back to interpreter mode off-TPU (tests run it on CPU).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _mha_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, causal: bool):
    q = q_ref[0]  # block is (1, T, hd); drop the unit (batch·head) axis
    k = k_ref[0]
    v = v_ref[0]
    s = jnp.dot(q, k.T, preferred_element_type=jnp.float32) * scale  # (T, T)
    if causal:  # lower-triangular mask in-register (decoder self-attention)
        ri = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
        ci = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(ri >= ci, s, jnp.float32(-1e9))
    s = s - jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    o_ref[0] = jnp.dot(
        p.astype(v.dtype), v, preferred_element_type=jnp.float32
    ).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret", "causal"))
def fused_mha(q: jax.Array, k: jax.Array, v: jax.Array,
              interpret: bool = False, causal: bool = False) -> jax.Array:
    """softmax(QKᵀ/√hd + optional causal mask)·V, one fused Pallas block per
    (batch·head).

    Args: q, k, v shaped ``(B, H, T, hd)``. Returns the same shape.
    """
    b, h, t, hd = q.shape
    scale = 1.0 / math.sqrt(hd)
    grid = (b * h,)

    def idx(i):
        return (i, 0, 0)

    def flat(x):
        return x.reshape(b * h, t, hd)

    out = pl.pallas_call(
        functools.partial(_mha_kernel, scale=scale, causal=causal),
        out_shape=jax.ShapeDtypeStruct((b * h, t, hd), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, t, hd), idx, memory_space=pltpu.VMEM)
            for _ in range(3)
        ],
        out_specs=pl.BlockSpec((1, t, hd), idx, memory_space=pltpu.VMEM),
        interpret=interpret,
    )(flat(q), flat(k), flat(v))
    return out.reshape(b, h, t, hd)


def mha_reference(q, k, v):
    """XLA einsum reference (same math, autodiff-friendly)."""
    hd = q.shape[-1]
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k) / math.sqrt(hd)
    p = jax.nn.softmax(s.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v)
