"""Low-overhead dropout for the training hot path.

The reference applies torch ``nn.Dropout`` at ~25 sites per training step
(torch ``TransformerEncoderLayer`` internals; SURVEY.md §2.2). On TPU those
masks are the single biggest non-matmul cost: at the flagship config they
account for the 115k→78k seqs/s gap (docs/PERF.md roofline).

``fast_dropout`` draws one random **byte** per element instead of
``jax.random.bernoulli``'s 32 bits and compares against an integer threshold.
Dropout needs nowhere near 2^-32 probability resolution; the keep probability
quantizes to ``round(keep*256)/256`` and kept values are rescaled by that
*effective* keep rate, so the estimator stays exactly unbiased. 4x less
hardware-PRNG volume and mask traffic → +6% whole-step training throughput
(82.9k vs 78.3k seqs/s, flagship config, real TPU v5e; docs/PERF.md).

Negative result, measured and rejected: wrapping the draw+apply in
``jax.checkpoint`` so the backward *regenerates* the mask instead of reading
the stored one (the idea behind the Pallas fused_ln kernel, also a shipped
negative result). The stored mask is a 1-byte pred XLA fuses into adjacent
ops; regenerating costs a second PRNG sweep that outweighs the saved read on
every variant tried (u8+remat 74.0k, 32-bit+remat 60.5k, vs 82.9k/78.3k
without). Masks are therefore generated once and stored.

Exactness contract (tests/test_dropout.py): bit-deterministic given
(key, shape, rate), backward is the true linearization (dropped positions get
exactly zero gradient, kept ones 1/keep_eff), and keep statistics match the
quantized rate.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def quantized_threshold(rate: float) -> int:
    """8-bit keep threshold: a byte below it keeps the element."""
    return round((1.0 - rate) * 256)


def quantized_keep_rate(rate: float) -> float:
    """The effective keep probability after 8-bit threshold quantization."""
    return quantized_threshold(rate) / 256.0


def fast_dropout(x: jax.Array, key: jax.Array, rate) -> jax.Array:
    """Dropout with an 8-bit mask (one random byte per element).

    ``rate`` is a python float in [0, 1) — or a traced scalar, in which case
    the integer threshold rides the computation as data (what lets
    train/vmap_sweep.py batch trials with *different* dropout rates into one
    vmapped program). Identity when the quantized keep rate is 1. Unbiased:
    E[out] == x for every ``rate``.
    """
    if isinstance(rate, (int, float)):
        if not 0.0 <= rate < 1.0:
            raise ValueError(f"dropout rate must be in [0, 1), got {rate}")
        thresh = quantized_threshold(rate)
        if thresh >= 256:
            return x
        keep_eff = thresh / 256.0
        mask = jax.random.bits(key, x.shape, jnp.uint8) < thresh
        return jnp.where(mask, x / jnp.asarray(keep_eff, x.dtype),
                         jnp.zeros((), x.dtype))
    # traced rate: same math with the threshold as data (int32 compare —
    # thresh=256 at rate 0 doesn't fit uint8 and must keep everything)
    thresh = jnp.round((1.0 - rate) * 256.0)
    keep_eff = (thresh / 256.0).astype(x.dtype)
    mask = (jax.random.bits(key, x.shape, jnp.uint8).astype(jnp.int32)
            < thresh.astype(jnp.int32))
    return jnp.where(mask, x / keep_eff, jnp.zeros((), x.dtype))
