"""Fused dropout + residual-add + LayerNorm (Pallas, custom VJP).

The post-LN encoder layer applies ``LN(x + dropout(y))`` twice per layer. As
XLA ops that is: generate a mask tensor (HBM), apply it (HBM round-trip), add,
then LN — with the mask also saved for the backward pass. Measured on the
flagship config, dropout-mask traffic is ~1/3 of the training step
(docs/PERF.md).

This kernel fuses the whole expression into one VMEM-resident block per row
tile, generating the mask from the TPU hardware PRNG (`pltpu.prng_seed` /
`prng_random_bits`) keyed by ``(seed, block_index)``. The backward kernel
*regenerates* the identical mask from the same seed instead of loading a saved
one — the mask never exists in HBM in either direction. Standard LayerNorm VJP
math otherwise; dscale/dbias come back as per-block partials reduced outside
(one tiny sum).

Semantics: dropout with keep prob ``1-rate`` scaled by ``1/(1-rate)``; LN over
the last axis with learned scale/bias, eps 1e-5 (torch default). The dropout
mask distribution matches flax/torch dropout; the RNG stream (hardware PRNG)
is different — irrelevant for training, and the deterministic path bypasses
this kernel entirely.

Measured verdict (docs/PERF.md, question closed in round 3): slower inside
the full training step at every shipped and probed width — ~11 % at the
flagship size (re-measured −14 % after the bf16-matmul change), and still
−3 % at GrooveXL width (d1024/ff4096, the "mask traffic grows linearly"
hypothesis this kernel was kept around to test). The LN is an O(d)
elementwise op XLA already fuses into the adjacent matmul epilogues; the
pallas_call boundary costs more than the regenerated mask saves. Ships OFF
(``config.fused_dropout_ln``) as a validated opt-in engineering record.
"""

from __future__ import annotations

import functools
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BLOCK_ROWS = 256
_EPS = 1e-5


def _keep_mask(shape, rate: float):
    """Bernoulli(1-rate) keep mask from the seeded hardware PRNG."""
    bits = pltpu.prng_random_bits(shape)  # uint32
    threshold = jnp.uint32(int(rate * float(2**32)))
    return (pltpu.bitcast(bits, jnp.uint32) >= threshold).astype(jnp.float32)


def _fwd_kernel(seed_ref, x_ref, y_ref, scale_ref, bias_ref, out_ref, *,
                rate: float):
    pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
    x = x_ref[:].astype(jnp.float32)
    y = y_ref[:].astype(jnp.float32)
    if rate > 0.0:
        y = y * _keep_mask(y.shape, rate) * (1.0 / (1.0 - rate))
    a = x + y
    mu = jnp.mean(a, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(a - mu), axis=-1, keepdims=True)
    zhat = (a - mu) * jax.lax.rsqrt(var + _EPS)
    out_ref[:] = (zhat * scale_ref[:] + bias_ref[:]).astype(out_ref.dtype)


def _bwd_kernel(seed_ref, x_ref, y_ref, scale_ref, g_ref,
                dx_ref, dy_ref, dscale_ref, dbias_ref, *, rate: float):
    pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
    x = x_ref[:].astype(jnp.float32)
    y = y_ref[:].astype(jnp.float32)
    if rate > 0.0:
        keep = _keep_mask(y.shape, rate) * (1.0 / (1.0 - rate))
        y = y * keep
    a = x + y
    mu = jnp.mean(a, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(a - mu), axis=-1, keepdims=True)
    inv = jax.lax.rsqrt(var + _EPS)
    zhat = (a - mu) * inv

    g = g_ref[:].astype(jnp.float32)
    gs = g * scale_ref[:]
    m1 = jnp.mean(gs, axis=-1, keepdims=True)
    m2 = jnp.mean(gs * zhat, axis=-1, keepdims=True)
    da = inv * (gs - m1 - zhat * m2)

    dx_ref[:] = da.astype(dx_ref.dtype)
    dy_ref[:] = (da * keep if rate > 0.0 else da).astype(dy_ref.dtype)
    # per-block partials for the parameter grads (reduced outside); the block
    # is (1, 8, d) to satisfy TPU sublane tiling — row 0 carries the value
    dscale_ref[0] = jnp.pad(jnp.sum(g * zhat, axis=0, keepdims=True),
                            ((0, 7), (0, 0)))
    dbias_ref[0] = jnp.pad(jnp.sum(g, axis=0, keepdims=True), ((0, 7), (0, 0)))


def _pad_rows(arr, rows):
    if arr.shape[0] == rows:
        return arr
    return jnp.pad(arr, ((0, rows - arr.shape[0]), (0, 0)))


def _interp(flag):
    # the TPU-semantics interpreter (plain interpret=True lacks TPU PRNG
    # primitives); NOTE: interpreter PRNG is stubbed to zeros — rate>0 paths
    # are only meaningful on real TPU
    return pltpu.InterpretParams() if flag else False


def _run_fwd(seed, x2, y2, scale, bias, rate, interpret):
    m, d = x2.shape
    padded = -(-m // _BLOCK_ROWS) * _BLOCK_ROWS
    grid = (padded // _BLOCK_ROWS,)
    row_spec = pl.BlockSpec((_BLOCK_ROWS, d), lambda i, *_: (i, 0),
                            memory_space=pltpu.VMEM)
    vec_spec = pl.BlockSpec((1, d), lambda i, *_: (0, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        partial(_fwd_kernel, rate=rate),
        out_shape=jax.ShapeDtypeStruct((padded, d), x2.dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=grid,
            in_specs=[row_spec, row_spec, vec_spec, vec_spec],
            out_specs=row_spec),
        interpret=_interp(interpret),
    )(seed, _pad_rows(x2, padded), _pad_rows(y2, padded),
      scale[None], bias[None])
    return out[:m]


def _run_bwd(seed, x2, y2, scale, g2, rate, interpret):
    m, d = x2.shape
    padded = -(-m // _BLOCK_ROWS) * _BLOCK_ROWS
    grid = (padded // _BLOCK_ROWS,)
    row_spec = pl.BlockSpec((_BLOCK_ROWS, d), lambda i, *_: (i, 0),
                            memory_space=pltpu.VMEM)
    vec_spec = pl.BlockSpec((1, d), lambda i, *_: (0, 0), memory_space=pltpu.VMEM)
    part_spec = pl.BlockSpec((1, 8, d), lambda i, *_: (i, 0, 0),
                             memory_space=pltpu.VMEM)
    dx, dy, dscale_p, dbias_p = pl.pallas_call(
        partial(_bwd_kernel, rate=rate),
        out_shape=(
            jax.ShapeDtypeStruct((padded, d), x2.dtype),
            jax.ShapeDtypeStruct((padded, d), y2.dtype),
            jax.ShapeDtypeStruct((grid[0], 8, d), jnp.float32),
            jax.ShapeDtypeStruct((grid[0], 8, d), jnp.float32),
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=grid,
            in_specs=[row_spec, row_spec, vec_spec, row_spec],
            out_specs=(row_spec, row_spec, part_spec, part_spec)),
        interpret=_interp(interpret),
    )(seed, _pad_rows(x2, padded), _pad_rows(y2, padded), scale[None],
      _pad_rows(g2, padded))
    return dx[:m], dy[:m], dscale_p[:, 0, :].sum(axis=0), dbias_p[:, 0, :].sum(axis=0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def dropout_add_layernorm(x, y, scale, bias, seed, rate: float,
                          interpret: bool = False):
    """``LN(x + dropout(y; rate)) * scale + bias`` fused on TPU.

    Args:
        x, y: ``(..., d)`` residual input and branch output.
        scale, bias: ``(d,)`` LayerNorm parameters.
        seed: int32 scalar array — the dropout stream (fold in step/site ids).
        rate: dropout probability (static). 0.0 compiles the mask away.
        interpret: run the kernel in interpreter mode (CPU tests).
    """
    out, _ = _fwd(x, y, scale, bias, seed, rate, interpret)
    return out


def _fwd(x, y, scale, bias, seed, rate, interpret):
    shape = x.shape
    d = shape[-1]
    x2 = x.reshape(-1, d)
    y2 = y.reshape(-1, d)
    seed_arr = jnp.asarray(seed, jnp.int32).reshape(1)
    out = _run_fwd(seed_arr, x2, y2, scale, bias, rate, interpret)
    return out.reshape(shape), (x2, y2, scale, seed_arr, shape)


def _bwd(rate, interpret, res, g):
    x2, y2, scale, seed_arr, shape = res
    d = shape[-1]
    g2 = g.reshape(-1, d)
    dx, dy, dscale, dbias = _run_bwd(seed_arr, x2, y2, scale, g2, rate,
                                     interpret)
    return (dx.reshape(shape), dy.reshape(shape),
            dscale.astype(scale.dtype), dbias.astype(scale.dtype), None)


dropout_add_layernorm.defvjp(_fwd, _bwd)


def dropout_add_layernorm_reference(x, y, scale, bias, key, rate: float):
    """Plain-JAX reference with jax.random (different RNG stream; used for
    rate=0 equivalence tests and CPU fallback semantics)."""
    if rate > 0.0:
        keep = jax.random.bernoulli(key, 1.0 - rate, y.shape)
        y = jnp.where(keep, y / (1.0 - rate), 0.0)
    a = (x + y).astype(jnp.float32)
    mu = jnp.mean(a, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(a - mu), axis=-1, keepdims=True)
    zhat = (a - mu) * jax.lax.rsqrt(var + _EPS)
    return (zhat * scale + bias).astype(x.dtype)
