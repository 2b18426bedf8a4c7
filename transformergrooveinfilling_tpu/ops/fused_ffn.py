"""Fused FFN training kernel: ``W2·dropout(relu(W1·x + b1)) + b2`` in VMEM.

Motivation (docs/PERF.md roofline): the FFN's hidden activation is the
training step's largest intermediate — (B·T, dim_ff) — and the XLA path
materializes it (plus the dropout mask) to HBM between the two matmuls,
because XLA does not fuse producers into dot operands. This kernel keeps the
whole chain in VMEM per row-tile: one MXU pass x@W1, bias+ReLU+8-bit-PRNG
dropout on the f32 accumulator, one MXU pass @W2. The only intermediate that
reaches HBM is ``h_drop`` (bf16), which the custom VJP stores as its *sole*
activation residual:

- ``dW2 = h_dropᵀ @ dy``
- ``dh = (dy @ W2ᵀ) · (h_drop > 0) / keep``  — wherever ``h_drop > 0`` the
  mask was 1 AND the ReLU was active, so one comparison replaces both the
  stored mask and the stored pre-activation sign.
- ``dx = dh @ W1ᵀ``, ``dW1 = xᵀ @ dh``, ``db1 = Σdh``, ``db2 = Σdy``.

The backward runs as a second Pallas kernel accumulating dW1/dW2/db across
row-tiles in VMEM.

Dropout semantics match ops/dropout.py::fast_dropout: one random byte per
element, keep threshold ``round(keep·256)``, unbiased rescale by the
quantized keep rate. The mask stream is the kernel PRNG's (seeded per tile),
not jax.random's — dropout streams are not bit-portable across paths anyway.

Constraints: training path only (TPU), ``d_model`` and ``dim_feedforward``
multiples of 128 (lane alignment), rows divisible by 8. Interpreter-mode
tests cover rate=0 exactly; rate>0 statistics are validated on hardware
(scripts/validate_tpu.py pattern), as with the other PRNG kernels.

Two kernel layouts, auto-selected by weight size (VERDICT r2 directive #6):

- **resident** (ff·d weights ≤ ~4 MB): both weight matrices live in VMEM for
  the whole row sweep — one grid dimension over row tiles.
- **K/F-tiled** (GrooveXL-class widths, ff 4096 × d 1024 = 16 MB bf16 —
  far past VMEM): grid (row_tiles, ff_tiles) with the ff sweep innermost;
  the x row-tile and an f32 ``out`` accumulator stay resident while each
  step streams one (d, tile_f) W1 slab and (tile_f, d) W2 slab. ``h_drop``
  is still the only intermediate reaching HBM.
"""

from __future__ import annotations

import functools

import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .dropout import quantized_keep_rate, quantized_threshold


def _pick_tile(m: int) -> int:
    for t in (512, 256, 128, 64, 32, 16, 8):
        if m % t == 0:
            return t
    raise ValueError(f"rows {m} not divisible by 8")


def _fwd_kernel(seed_ref, x_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                out_ref, h_ref, *, thresh: int, interpret: bool):
    i = pl.program_id(0)
    a1 = jnp.dot(x_ref[:], w1_ref[:], preferred_element_type=jnp.float32)
    a1 = jnp.maximum(a1 + b1_ref[:], 0.0)
    if thresh < 256:
        keep = thresh / 256.0
        if interpret:  # interpreter PRNG is stubbed — keep everything
            mask = jnp.ones(a1.shape, bool)
        else:
            pltpu.prng_seed(seed_ref[0] + i)
            bits = pltpu.prng_random_bits(a1.shape)
            mask = (pltpu.bitcast(bits, jnp.uint32) & 0xFF) < thresh
        a1 = jnp.where(mask, a1 / keep, 0.0)
    h = a1.astype(h_ref.dtype)
    h_ref[:] = h
    out = jnp.dot(h, w2_ref[:], preferred_element_type=jnp.float32)
    out_ref[:] = (out + b2_ref[:]).astype(out_ref.dtype)


def _bwd_kernel(dy_ref, x_ref, h_ref, w1_ref, w2_ref,
                dx_ref, dw1_ref, dw2_ref, db1_ref, db2_ref,
                *, keep: float):
    i = pl.program_id(0)
    dy = dy_ref[:]
    h = h_ref[:]
    g = jnp.dot(dy, w2_ref[:].T, preferred_element_type=jnp.float32)
    # compare in f32: Mosaic rejects bf16 cmpf on this target
    alive = h.astype(jnp.float32) > 0.0
    dh = jnp.where(alive, g / keep, 0.0).astype(h.dtype)
    dx_ref[:] = jnp.dot(dh, w1_ref[:].T,
                        preferred_element_type=jnp.float32).astype(dx_ref.dtype)

    dw1_t = jnp.dot(x_ref[:].T, dh, preferred_element_type=jnp.float32)
    dw2_t = jnp.dot(h.T, dy, preferred_element_type=jnp.float32)
    db1_t = jnp.sum(dh.astype(jnp.float32), axis=0, keepdims=True)
    db2_t = jnp.sum(dy.astype(jnp.float32), axis=0, keepdims=True)

    @pl.when(i == 0)
    def _init():
        dw1_ref[:] = dw1_t
        dw2_ref[:] = dw2_t
        db1_ref[:] = db1_t
        db2_ref[:] = db2_t

    @pl.when(i != 0)
    def _acc():
        dw1_ref[:] += dw1_t
        dw2_ref[:] += dw2_t
        db1_ref[:] += db1_t
        db2_ref[:] += db2_t


def _pick_tile_f(f: int) -> int:
    for t in (512, 256, 128):
        if f % t == 0:
            return t
    raise ValueError(f"dim_feedforward {f} not divisible by 128")


# weights bigger than this stream as K/F tiles instead of living VMEM-resident
# (VMEM is ~16 MB/core; the resident kernel's x/w1/w2/out/h working set must
# fit with double buffering — ff 1024 × d 256 ≈ 1 MB weights was the round-2
# cap, and GrooveXL-class ff 4096 × d 1024 = 16 MB cannot be resident)
_RESIDENT_WEIGHT_BYTES = 4 * 1024 * 1024


def fits_resident(d_model: int, dim_feedforward: int, itemsize: int) -> bool:
    """True when both FFN weight matrices fit the VMEM-resident kernel (the
    layout with the measured training win; docs/PERF.md). The single source
    of the residency formula — kernel dispatch and the auto-enable rule
    (train/config.py::resolve_fused_ffn) both call this."""
    return 2 * d_model * dim_feedforward * itemsize <= _RESIDENT_WEIGHT_BYTES


def _fwd_kernel_tiled(seed_ref, x_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                      out_ref, h_ref, *, thresh: int, interpret: bool,
                      n_f_tiles: int):
    """K/F-tiled forward: grid (row_tiles, ff_tiles), ff innermost.

    The row tile of ``x`` and the f32 ``out`` accumulator stay VMEM-resident
    across the ff sweep; each step streams one (d, tile_f) slab of W1 and
    (tile_f, d) of W2, computes its partial ``drop(relu(x·W1_j))·W2_j`` and
    accumulates. Only ``h_drop`` reaches HBM (the custom VJP's sole
    residual), exactly as in the resident kernel."""
    i = pl.program_id(0)
    j = pl.program_id(1)
    a1 = jnp.dot(x_ref[:], w1_ref[:], preferred_element_type=jnp.float32)
    a1 = jnp.maximum(a1 + b1_ref[:], 0.0)
    if thresh < 256:
        keep = thresh / 256.0
        if interpret:  # interpreter PRNG is stubbed — keep everything
            mask = jnp.ones(a1.shape, bool)
        else:
            pltpu.prng_seed(seed_ref[0] + i * n_f_tiles + j)
            bits = pltpu.prng_random_bits(a1.shape)
            mask = (pltpu.bitcast(bits, jnp.uint32) & 0xFF) < thresh
        a1 = jnp.where(mask, a1 / keep, 0.0)
    h = a1.astype(h_ref.dtype)
    h_ref[:] = h
    partial = jnp.dot(h, w2_ref[:], preferred_element_type=jnp.float32)

    @pl.when(j == 0)
    def _init():
        out_ref[:] = partial + b2_ref[:]

    @pl.when(j != 0)
    def _acc():
        out_ref[:] += partial


def _fwd_call_tiled(x, w1, b1, w2, b2, seed, *, rate: float, interpret: bool):
    m, k = x.shape
    f = w1.shape[1]
    tile_m = min(_pick_tile(m), 256)
    tile_f = _pick_tile_f(f)
    thresh = quantized_threshold(rate)
    grid = (m // tile_m, f // tile_f)
    out, h = pl.pallas_call(
        functools.partial(_fwd_kernel_tiled, thresh=thresh,
                          interpret=interpret, n_f_tiles=grid[1]),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((tile_m, k), lambda i, j, s: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((k, tile_f), lambda i, j, s: (0, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tile_f), lambda i, j, s: (0, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tile_f, k), lambda i, j, s: (j, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, k), lambda i, j, s: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                # f32 accumulator, revisited across the ff sweep
                pl.BlockSpec((tile_m, k), lambda i, j, s: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tile_m, tile_f), lambda i, j, s: (i, j),
                             memory_space=pltpu.VMEM),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((m, k), jnp.float32),
            jax.ShapeDtypeStruct((m, f), x.dtype),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * m * k * f,
            bytes_accessed=2 * (2 * m * k + 2 * k * f + m * f),
            transcendentals=0),
        interpret=interpret,
    )(seed, x, w1, b1.reshape(1, -1), w2, b2.reshape(1, -1))
    return out.astype(x.dtype), h


def _fwd_call(x, w1, b1, w2, b2, seed, *, rate: float, interpret: bool):
    m, k = x.shape
    f = w1.shape[1]
    if not fits_resident(k, f, w1.dtype.itemsize):
        return _fwd_call_tiled(x, w1, b1, w2, b2, seed, rate=rate,
                               interpret=interpret)
    tile = _pick_tile(m)
    thresh = quantized_threshold(rate)
    grid = m // tile
    out, h = pl.pallas_call(
        functools.partial(_fwd_kernel, thresh=thresh, interpret=interpret),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(grid,),
            # index maps receive the scalar-prefetch ref as a trailing arg
            in_specs=[
                pl.BlockSpec((tile, k), lambda i, s: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((k, f), lambda i, s: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, f), lambda i, s: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((f, k), lambda i, s: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, k), lambda i, s: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((tile, k), lambda i, s: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tile, f), lambda i, s: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((m, k), x.dtype),
            jax.ShapeDtypeStruct((m, f), x.dtype),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * m * k * f,
            bytes_accessed=2 * (2 * m * k + 2 * k * f + m * f),
            transcendentals=0),
        interpret=interpret,
    )(seed, x, w1, b1.reshape(1, -1), w2, b2.reshape(1, -1))
    return out, h


def _bwd_call(dy, x, h, w1, w2, *, rate: float, interpret: bool):
    m, k = x.shape
    f = w1.shape[1]
    tile = _pick_tile(m)
    keep = quantized_keep_rate(rate)
    grid = m // tile
    dx, dw1, dw2, db1, db2 = pl.pallas_call(
        functools.partial(_bwd_kernel, keep=keep),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((tile, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, f), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, f), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((f, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tile, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, f), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((f, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, f), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((m, k), x.dtype),
            jax.ShapeDtypeStruct((k, f), jnp.float32),
            jax.ShapeDtypeStruct((f, k), jnp.float32),
            jax.ShapeDtypeStruct((1, f), jnp.float32),
            jax.ShapeDtypeStruct((1, k), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=8 * m * k * f,
            bytes_accessed=2 * (3 * m * k + 2 * m * f + 4 * k * f),
            transcendentals=0),
        interpret=interpret,
    )(dy, x, h, w1, w2)
    return dx, dw1, dw2, db1.reshape(-1), db2.reshape(-1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def ffn_train(x, w1, b1, w2, b2, seed, rate: float, interpret: bool = False):
    """Fused FFN forward for the training path.

    ``x``: (rows, d) activations (bf16 or f32); ``w1`` (d, ff) / ``w2``
    (ff, d) compute-dtype kernels; ``b1``/``b2`` f32 biases; ``seed`` an
    int32 scalar array; ``rate`` a static dropout rate.
    """
    out, _h = _fwd_call(x, w1, b1, w2, b2, seed, rate=rate,
                        interpret=interpret)
    return out


def _ffn_fwd(x, w1, b1, w2, b2, seed, rate, interpret):
    out, h = _fwd_call(x, w1, b1, w2, b2, seed, rate=rate, interpret=interpret)
    return out, (x, h, w1, w2)


_BWD_IMPL = os.environ.get("TGI_FUSED_FFN_BWD", "xla")


def _ffn_bwd(rate, interpret, res, dy):
    x, h, w1, w2 = res
    resident = fits_resident(w1.shape[0], w1.shape[1], w1.dtype.itemsize)
    if _BWD_IMPL == "pallas" and resident:
        dx, dw1, dw2, db1, db2 = _bwd_call(dy, x, h, w1, w2, rate=rate,
                                           interpret=interpret)
        return (dx, dw1.astype(w1.dtype), db1, dw2.astype(w2.dtype), db2,
                None)
    # XLA-composed backward from the sole h_drop residual: plain matmuls the
    # compiler schedules/fuses freely (measured faster than the Pallas bwd's
    # serialized dW accumulation at flagship size)
    keep = quantized_keep_rate(rate)
    g = jnp.dot(dy, w2.T, preferred_element_type=jnp.float32)
    dh = jnp.where(h.astype(jnp.float32) > 0, g / keep, 0.0).astype(h.dtype)
    dx = jnp.dot(dh, w1.T, preferred_element_type=jnp.float32).astype(x.dtype)
    dw1 = jnp.dot(x.T, dh, preferred_element_type=jnp.float32)
    dw2 = jnp.dot(h.T, dy, preferred_element_type=jnp.float32)
    db1 = jnp.sum(dh.astype(jnp.float32), axis=0)
    db2 = jnp.sum(dy.astype(jnp.float32), axis=0)
    return (dx, dw1.astype(w1.dtype), db1, dw2.astype(w2.dtype), db2, None)


ffn_train.defvjp(_ffn_fwd, _ffn_bwd)
