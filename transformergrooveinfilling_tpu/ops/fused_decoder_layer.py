"""Whole-decoder-layer fused training kernel: ONE Pallas call per layer.

The encoder-only flagship gained +26 % whole-step from fusing the entire
post-LN layer into one ``pallas_call`` (ops/fused_layer.py, docs/PERF.md
round 4). The encoder-decoder family (reference ``encoder_only=0``,
/root/reference/train.py:125-127) has the same dropout-traffic structure
with MORE sites per layer — causal self-attention, cross-attention and the
FFN contribute 2·n_heads + 4 dropout masks — so the same design is applied
to the decoder layer:

    qkv = y·Wqkv + b                      (causal self-attention, MXU)
    per head: P = softmax(causal+seq mask(Q·Kᵀ/√hd)); A_h = drop(P)·V_h
    a1 = y + drop(A·Wo + bo);   y1 = LN1(a1)
    qc = y1·Wq + bq;  kv = mem·Wkv + bkv  (cross-attention)
    per head: Pc = softmax(seq mask(Qc·Kcᵀ/√hd)); B_h = drop(Pc)·Vc_h
    a2 = y1 + drop(B·Wo2 + bo2); y2 = LN2(a2)
    h  = drop(relu(y2·W1 + b1))
    a3 = y2 + drop(h·W2 + b2);   y3 = LN3(a3)

All masks come from the in-kernel hardware PRNG (per-tile seed, stride 16:
self heads 0-4, cross heads 5-9, four elementwise sites 10-13) and are
REGENERATED in the backward kernel — they never touch HBM. Like the encoder
kernel, the custom VJP stores only the attention PROJECTIONS (qkv, qc, kv)
plus the pre-norm residuals (a1, a2, a3) and the dropped FFN hidden (h);
both attentions' softmax probabilities and outputs are recomputed in the
backward bit-exactly from the stored bf16 projections. The backward emits
``dmem`` (the cross-attention K/V path's cotangent into the encoder stack)
alongside dx and all 20 parameter gradients, accumulated across row tiles
in VMEM.

Attention uses the same dense block-diagonal trick as the encoder kernel
(one (tile, tile) MXU matmul per head, cross-sequence positions masked to
-inf; the self-attention block additionally masks future positions), and
64-wide heads pack two per 128-lane group with lane-masked operands
(fused_layer.py's ``_head_groups``/``_lane_mask``). Memory rows tile
identically to target rows: both are (batch·seq, d) in the same sequence
order, so block row i of ``mem`` holds exactly the sequences of block row i
of ``y``.

Constraints and interpret-mode semantics match ops/fused_layer.py (shared
``supports_fused_layer`` width gate); hardware validation lives in
scripts/validate_fused_layer.py.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .dropout import quantized_threshold
from .fused_layer import (
    _block_diag_softmax, _head_groups, _lane_mask, _ln_stats, _make_mask,
    pick_layer_tile, supports_fused_layer,
)

# per-tile seed stride 16: self heads 0..4, cross heads 5..9, then the four
# elementwise sites
_STRIDE = 16
_SITE_CROSS0 = 5
_SITE_M1, _SITE_M2, _SITE_M3, _SITE_M4 = 10, 11, 12, 13

supports_fused_decoder_layer = supports_fused_layer


def _mask(seed0, i, site, shape, thresh, interpret):
    return _make_mask(seed0, i, site, shape, thresh, interpret,
                      stride=_STRIDE)


def _attn_fwd(src, q_off, k_src, k_off, v_off, d, n_heads, seq_len, scale,
              seed0, i, site0, thresh, drop, keep, cd, interpret,
              causal: bool):
    """Grouped block-diagonal attention forward shared by both blocks:
    reads Q from ``src`` at ``q_off`` and K/V from ``k_src`` at
    ``k_off``/``v_off``, returns the concatenated (tile, d) output in f32
    and the per-head (p, pd) lists for the backward's reuse pattern."""
    tile = src.shape[0]
    hd = d // n_heads
    g, gw, n_groups = _head_groups(n_heads, hd)
    parts, ps, pds = [], [], []
    for gg in range(n_groups):
        qg = src[:, q_off + gg * gw:q_off + (gg + 1) * gw]
        kg = k_src[:, k_off + gg * gw:k_off + (gg + 1) * gw]
        vg = k_src[:, v_off + gg * gw:v_off + (gg + 1) * gw]
        lane = jax.lax.broadcasted_iota(jnp.int32, (tile, gw), 1) // hd
        acc = None
        for pos in range(g):
            hh = gg * g + pos
            p = _block_diag_softmax(_lane_mask(qg, lane, pos, g), kg,
                                    seq_len, scale, causal=causal)
            if drop:
                mh = _mask(seed0, i, site0 + hh, (tile, tile), thresh,
                           interpret)
                pd = jnp.where(mh, p / keep, 0.0)
            else:
                pd = p
            ps.append(p)
            pds.append(pd)
            a = jnp.dot(pd.astype(cd), _lane_mask(vg, lane, pos, g),
                        preferred_element_type=jnp.float32)
            acc = a if acc is None else acc + a
        parts.append(acc)
    return jnp.concatenate(parts, axis=1), ps, pds


def _attn_bwd(dattn, src, q_off, k_src, k_off, v_off, ps, pds, d, n_heads,
              seq_len, scale, seed0, i, site0, thresh, drop, keep, cd,
              interpret):
    """Grouped attention backward: returns (dq, dk, dv) each (tile, d) in
    compute dtype. ``ps``/``pds`` are the forward's recomputed per-head
    probabilities (this call site recomputes them via _attn_fwd first)."""
    tile = src.shape[0]
    hd = d // n_heads
    g, gw, n_groups = _head_groups(n_heads, hd)
    dq_parts, dk_parts, dv_parts = [], [], []
    for gg in range(n_groups):
        qg = src[:, q_off + gg * gw:q_off + (gg + 1) * gw]
        kg = k_src[:, k_off + gg * gw:k_off + (gg + 1) * gw]
        vg = k_src[:, v_off + gg * gw:v_off + (gg + 1) * gw]
        dag = dattn[:, gg * gw:(gg + 1) * gw]
        lane = jax.lax.broadcasted_iota(jnp.int32, (tile, gw), 1) // hd
        dqg = dkg = dvg = None
        for pos in range(g):
            hh = gg * g + pos
            dah = _lane_mask(dag, lane, pos, g)
            p, pd = ps[hh], pds[hh]
            dv_c = jnp.dot(pd.astype(cd).T, dah,
                           preferred_element_type=jnp.float32)
            dpd = jnp.dot(dah, vg.T, preferred_element_type=jnp.float32)
            if drop:
                mh = _mask(seed0, i, site0 + hh, (tile, tile), thresh,
                           interpret)
                dp = jnp.where(mh, dpd / keep, 0.0)
            else:
                dp = dpd
            # softmax jacobian: masked (cross-sequence / future) columns
            # have p == 0, so their dS vanishes without re-masking
            ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
            ds = (ds * scale).astype(cd)
            dq_c = jnp.dot(ds, _lane_mask(kg, lane, pos, g),
                           preferred_element_type=jnp.float32)
            dk_c = jnp.dot(ds.T, _lane_mask(qg, lane, pos, g),
                           preferred_element_type=jnp.float32)
            dqg = dq_c if dqg is None else dqg + dq_c
            dkg = dk_c if dkg is None else dkg + dk_c
            dvg = dv_c if dvg is None else dvg + dv_c
        dq_parts.append(dqg.astype(cd))
        dk_parts.append(dkg.astype(cd))
        dv_parts.append(dvg.astype(cd))
    return (jnp.concatenate(dq_parts, axis=1),
            jnp.concatenate(dk_parts, axis=1),
            jnp.concatenate(dv_parts, axis=1))


def _fwd_kernel(seed_ref, y_ref, mem_ref,
                wqkv_ref, bqkv_ref, wo_ref, bo_ref,
                wq_ref, bq_ref, wkv_ref, bkv_ref, wo2_ref, bo2_ref,
                g1_ref, b1_ref, w1_ref, b1f_ref, w2_ref, b2f_ref,
                g2_ref, b2_ref, g3_ref, b3_ref,
                out_ref, qkv_ref, a1_ref, qc_ref, kvc_ref, a2_ref,
                h_ref, a3_ref,
                *, thresh: int, n_heads: int, seq_len: int, interpret: bool):
    i = pl.program_id(0)
    seed0 = seed_ref[0]
    tile, d = y_ref.shape
    hd = d // n_heads
    keep = thresh / 256.0
    scale = 1.0 / math.sqrt(hd)
    drop = thresh < 256
    cd = y_ref.dtype

    yb = y_ref[:]
    qkv = jnp.dot(yb, wqkv_ref[:],
                  preferred_element_type=jnp.float32) + bqkv_ref[:]
    qkvc = qkv.astype(cd)
    qkv_ref[:] = qkvc

    attn, _, _ = _attn_fwd(qkvc, 0, qkvc, d, 2 * d, d, n_heads, seq_len,
                           scale, seed0, i, 0, thresh, drop, keep, cd,
                           interpret, causal=True)
    proj = jnp.dot(attn.astype(cd), wo_ref[:],
                   preferred_element_type=jnp.float32) + bo_ref[:]
    if drop:
        m1 = _mask(seed0, i, _SITE_M1, proj.shape, thresh, interpret)
        proj = jnp.where(m1, proj / keep, 0.0)
    a1 = yb.astype(jnp.float32) + proj
    a1_ref[:] = a1.astype(cd)
    zh1, _ = _ln_stats(a1)
    y1 = (zh1 * g1_ref[:] + b1_ref[:]).astype(cd)

    qc = (jnp.dot(y1, wq_ref[:],
                  preferred_element_type=jnp.float32) + bq_ref[:]).astype(cd)
    qc_ref[:] = qc
    kvc = (jnp.dot(mem_ref[:], wkv_ref[:],
                   preferred_element_type=jnp.float32)
           + bkv_ref[:]).astype(cd)
    kvc_ref[:] = kvc
    catt, _, _ = _attn_fwd(qc, 0, kvc, 0, d, d, n_heads, seq_len, scale,
                           seed0, i, _SITE_CROSS0, thresh, drop, keep, cd,
                           interpret, causal=False)
    proj2 = jnp.dot(catt.astype(cd), wo2_ref[:],
                    preferred_element_type=jnp.float32) + bo2_ref[:]
    if drop:
        m2 = _mask(seed0, i, _SITE_M2, proj2.shape, thresh, interpret)
        proj2 = jnp.where(m2, proj2 / keep, 0.0)
    a2 = y1.astype(jnp.float32) + proj2
    a2_ref[:] = a2.astype(cd)
    zh2, _ = _ln_stats(a2)
    y2 = (zh2 * g2_ref[:] + b2_ref[:]).astype(cd)

    hpre = jnp.dot(y2, w1_ref[:],
                   preferred_element_type=jnp.float32) + b1f_ref[:]
    hrelu = jnp.maximum(hpre, 0.0)
    if drop:
        m3 = _mask(seed0, i, _SITE_M3, hrelu.shape, thresh, interpret)
        hrelu = jnp.where(m3, hrelu / keep, 0.0)
    hb = hrelu.astype(cd)
    h_ref[:] = hb

    f = jnp.dot(hb, w2_ref[:],
                preferred_element_type=jnp.float32) + b2f_ref[:]
    if drop:
        m4 = _mask(seed0, i, _SITE_M4, f.shape, thresh, interpret)
        f = jnp.where(m4, f / keep, 0.0)
    a3 = y2.astype(jnp.float32) + f
    a3_ref[:] = a3.astype(cd)
    zh3, _ = _ln_stats(a3)
    out_ref[:] = (zh3 * g3_ref[:] + b3_ref[:]).astype(cd)


def _bwd_kernel(seed_ref, dy_ref, y_ref, mem_ref, qkv_ref, a1_ref, qc_ref,
                kvc_ref, a2_ref, h_ref, a3_ref,
                wqkv_ref, wo_ref, wq_ref, wkv_ref, wo2_ref, w1_ref, w2_ref,
                g1_ref, b1_ref, g2_ref, b2_ref, g3_ref,
                dx_ref, dmem_ref,
                dwqkv_ref, dbqkv_ref, dwo_ref, dbo_ref,
                dwq_ref, dbq_ref, dwkv_ref, dbkv_ref, dwo2_ref, dbo2_ref,
                dg1_ref, db1_ref, dw1_ref, db1f_ref, dw2_ref, db2f_ref,
                dg2_ref, db2_ref, dg3_ref, db3_ref,
                *, thresh: int, n_heads: int, seq_len: int, interpret: bool):
    i = pl.program_id(0)
    seed0 = seed_ref[0]
    tile, d = y_ref.shape
    hd = d // n_heads
    keep = thresh / 256.0
    scale = 1.0 / math.sqrt(hd)
    drop = thresh < 256
    cd = y_ref.dtype

    dy = dy_ref[:].astype(jnp.float32)

    # LN3 backward from the stored pre-norm activation
    a3 = a3_ref[:].astype(jnp.float32)
    zh3, rstd3 = _ln_stats(a3)
    dg3_t = jnp.sum(dy * zh3, axis=0, keepdims=True)
    db3_t = jnp.sum(dy, axis=0, keepdims=True)
    dzh3 = dy * g3_ref[:]
    da3 = rstd3 * (dzh3 - jnp.mean(dzh3, axis=-1, keepdims=True)
                   - zh3 * jnp.mean(dzh3 * zh3, axis=-1, keepdims=True))

    if drop:
        m4 = _mask(seed0, i, _SITE_M4, da3.shape, thresh, interpret)
        df = jnp.where(m4, da3 / keep, 0.0)
    else:
        df = da3
    dfb = df.astype(cd)

    # FFN backward; h > 0 recovers the M3 mask AND the ReLU sign
    h = h_ref[:]
    dw2_t = jnp.dot(h.T, dfb, preferred_element_type=jnp.float32)
    db2f_t = jnp.sum(df, axis=0, keepdims=True)
    dhd = jnp.dot(dfb, w2_ref[:].T, preferred_element_type=jnp.float32)
    dhpre = jnp.where(h.astype(jnp.float32) > 0.0, dhd / keep, 0.0)
    dhpreb = dhpre.astype(cd)

    # recompute y2 from the stored a2
    a2 = a2_ref[:].astype(jnp.float32)
    zh2, rstd2 = _ln_stats(a2)
    y2 = (zh2 * g2_ref[:] + b2_ref[:]).astype(cd)
    dw1_t = jnp.dot(y2.T, dhpreb, preferred_element_type=jnp.float32)
    db1f_t = jnp.sum(dhpre, axis=0, keepdims=True)
    dy2 = jnp.dot(dhpreb, w1_ref[:].T,
                  preferred_element_type=jnp.float32) + da3

    # LN2 backward
    dg2_t = jnp.sum(dy2 * zh2, axis=0, keepdims=True)
    db2_t = jnp.sum(dy2, axis=0, keepdims=True)
    dzh2 = dy2 * g2_ref[:]
    da2 = rstd2 * (dzh2 - jnp.mean(dzh2, axis=-1, keepdims=True)
                   - zh2 * jnp.mean(dzh2 * zh2, axis=-1, keepdims=True))

    if drop:
        m2 = _mask(seed0, i, _SITE_M2, da2.shape, thresh, interpret)
        dproj2 = jnp.where(m2, da2 / keep, 0.0)
    else:
        dproj2 = da2
    dproj2b = dproj2.astype(cd)

    # cross-attention: recompute Pc bit-exactly from the stored projections
    qc = qc_ref[:]
    kvc = kvc_ref[:]
    catt, cps, cpds = _attn_fwd(qc, 0, kvc, 0, d, d, n_heads, seq_len,
                                scale, seed0, i, _SITE_CROSS0, thresh, drop,
                                keep, cd, interpret, causal=False)
    cattb = catt.astype(cd)
    dwo2_t = jnp.dot(cattb.T, dproj2b, preferred_element_type=jnp.float32)
    dbo2_t = jnp.sum(dproj2, axis=0, keepdims=True)
    dcatt = jnp.dot(dproj2b, wo2_ref[:].T,
                    preferred_element_type=jnp.float32).astype(cd)
    dqc, dkc, dvc = _attn_bwd(dcatt, qc, 0, kvc, 0, d, cps, cpds, d,
                              n_heads, seq_len, scale, seed0, i,
                              _SITE_CROSS0, thresh, drop, keep, cd,
                              interpret)
    dkvc = jnp.concatenate([dkc, dvc], axis=1)

    # cross projections: dWq needs y1 (recomputed from a1), dWkv needs mem
    a1 = a1_ref[:].astype(jnp.float32)
    zh1, rstd1 = _ln_stats(a1)
    y1 = (zh1 * g1_ref[:] + b1_ref[:]).astype(cd)
    dwq_t = jnp.dot(y1.T, dqc, preferred_element_type=jnp.float32)
    dbq_t = jnp.sum(dqc.astype(jnp.float32), axis=0, keepdims=True)
    memb = mem_ref[:]
    dwkv_t = jnp.dot(memb.T, dkvc, preferred_element_type=jnp.float32)
    dbkv_t = jnp.sum(dkvc.astype(jnp.float32), axis=0, keepdims=True)
    dmem_ref[:] = jnp.dot(dkvc, wkv_ref[:].T,
                          preferred_element_type=jnp.float32).astype(cd)
    dy1 = jnp.dot(dqc, wq_ref[:].T,
                  preferred_element_type=jnp.float32) + da2

    # LN1 backward
    dg1_t = jnp.sum(dy1 * zh1, axis=0, keepdims=True)
    db1_t = jnp.sum(dy1, axis=0, keepdims=True)
    dzh1 = dy1 * g1_ref[:]
    da1 = rstd1 * (dzh1 - jnp.mean(dzh1, axis=-1, keepdims=True)
                   - zh1 * jnp.mean(dzh1 * zh1, axis=-1, keepdims=True))

    if drop:
        m1 = _mask(seed0, i, _SITE_M1, da1.shape, thresh, interpret)
        dproj = jnp.where(m1, da1 / keep, 0.0)
    else:
        dproj = da1
    dprojb = dproj.astype(cd)

    # causal self-attention: recompute from the stored qkv
    qkv = qkv_ref[:]
    attn, sps, spds = _attn_fwd(qkv, 0, qkv, d, 2 * d, d, n_heads, seq_len,
                                scale, seed0, i, 0, thresh, drop, keep, cd,
                                interpret, causal=True)
    attnb = attn.astype(cd)
    dwo_t = jnp.dot(attnb.T, dprojb, preferred_element_type=jnp.float32)
    dbo_t = jnp.sum(dproj, axis=0, keepdims=True)
    dattn = jnp.dot(dprojb, wo_ref[:].T,
                    preferred_element_type=jnp.float32).astype(cd)
    dq, dk, dv = _attn_bwd(dattn, qkv, 0, qkv, d, 2 * d, sps, spds, d,
                           n_heads, seq_len, scale, seed0, i, 0, thresh,
                           drop, keep, cd, interpret)
    dqkv = jnp.concatenate([dq, dk, dv], axis=1)

    dbqkv_t = jnp.sum(dqkv.astype(jnp.float32), axis=0, keepdims=True)
    yb = y_ref[:]
    dwqkv_t = jnp.dot(yb.T, dqkv, preferred_element_type=jnp.float32)
    dx = da1 + jnp.dot(dqkv, wqkv_ref[:].T,
                       preferred_element_type=jnp.float32)
    dx_ref[:] = dx.astype(cd)

    accs = (
        (dwqkv_ref, dwqkv_t), (dbqkv_ref, dbqkv_t), (dwo_ref, dwo_t),
        (dbo_ref, dbo_t), (dwq_ref, dwq_t), (dbq_ref, dbq_t),
        (dwkv_ref, dwkv_t), (dbkv_ref, dbkv_t), (dwo2_ref, dwo2_t),
        (dbo2_ref, dbo2_t), (dg1_ref, dg1_t), (db1_ref, db1_t),
        (dw1_ref, dw1_t), (db1f_ref, db1f_t), (dw2_ref, dw2_t),
        (db2f_ref, db2f_t), (dg2_ref, dg2_t), (db2_ref, db2_t),
        (dg3_ref, dg3_t), (db3_ref, db3_t),
    )

    @pl.when(i == 0)
    def _init():
        for ref, t in accs:
            ref[:] = t

    @pl.when(i != 0)
    def _acc():
        for ref, t in accs:
            ref[:] += t


def _const(shape):
    return pl.BlockSpec(shape, lambda i, s: tuple(0 for _ in shape),
                        memory_space=pltpu.VMEM)


def _rows(tile, width):
    return pl.BlockSpec((tile, width), lambda i, s: (i, 0),
                        memory_space=pltpu.VMEM)


def _fwd_call(y, mem, wqkv, bqkv, wo, bo, wq, bq, wkv, bkv, wo2, bo2,
              g1, b1, w1, b1f, w2, b2f, g2, b2, g3, b3, seed,
              *, rate: float, n_heads: int, seq_len: int, interpret: bool):
    m, d = y.shape
    ff = w1.shape[1]
    tile = pick_layer_tile(m, seq_len)
    thresh = quantized_threshold(rate)
    row2 = lambda v: v.reshape(1, -1)
    vma = jax.typeof(y).vma
    outs = pl.pallas_call(
        functools.partial(_fwd_kernel, thresh=thresh, n_heads=n_heads,
                          seq_len=seq_len, interpret=interpret),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(m // tile,),
            in_specs=[
                _rows(tile, d),            # y
                _rows(tile, d),            # mem
                _const((d, 3 * d)),        # wqkv
                _const((1, 3 * d)),        # bqkv
                _const((d, d)),            # wo
                _const((1, d)),            # bo
                _const((d, d)),            # wq
                _const((1, d)),            # bq
                _const((d, 2 * d)),        # wkv
                _const((1, 2 * d)),        # bkv
                _const((d, d)),            # wo2
                _const((1, d)),            # bo2
                _const((1, d)),            # g1
                _const((1, d)),            # b1
                _const((d, ff)),           # w1
                _const((1, ff)),           # b1f
                _const((ff, d)),           # w2
                _const((1, d)),            # b2f
                _const((1, d)),            # g2
                _const((1, d)),            # b2
                _const((1, d)),            # g3
                _const((1, d)),            # b3
            ],
            out_specs=[
                _rows(tile, d),            # y3
                _rows(tile, 3 * d),        # qkv
                _rows(tile, d),            # a1
                _rows(tile, d),            # qc
                _rows(tile, 2 * d),        # kvc
                _rows(tile, d),            # a2
                _rows(tile, ff),           # h_drop
                _rows(tile, d),            # a3
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((m, d), y.dtype, vma=vma),
            jax.ShapeDtypeStruct((m, 3 * d), y.dtype, vma=vma),
            jax.ShapeDtypeStruct((m, d), y.dtype, vma=vma),
            jax.ShapeDtypeStruct((m, d), y.dtype, vma=vma),
            jax.ShapeDtypeStruct((m, 2 * d), y.dtype, vma=vma),
            jax.ShapeDtypeStruct((m, d), y.dtype, vma=vma),
            jax.ShapeDtypeStruct((m, ff), y.dtype, vma=vma),
            jax.ShapeDtypeStruct((m, d), y.dtype, vma=vma),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * m * (3 * d * d + 3 * d * d + 2 * d * ff)
            + 8 * m * tile * d,
            bytes_accessed=2 * m * (12 * d + ff)
            + 2 * (7 * d * d + 2 * d * ff),
            transcendentals=2 * m * tile * n_heads),
        interpret=interpret,
    )(seed, y, mem, wqkv, row2(bqkv), wo, row2(bo), wq, row2(bq),
      wkv, row2(bkv), wo2, row2(bo2), row2(g1), row2(b1),
      w1, row2(b1f), w2, row2(b2f), row2(g2), row2(b2), row2(g3), row2(b3))
    return outs


def _bwd_call(dy, y, mem, qkv, a1, qc, kvc, a2, h, a3,
              wqkv, wo, wq, wkv, wo2, w1, w2, g1, b1, g2, b2, g3,
              seed, *, rate: float, n_heads: int, seq_len: int,
              interpret: bool):
    m, d = y.shape
    ff = w1.shape[1]
    tile = pick_layer_tile(m, seq_len)
    thresh = quantized_threshold(rate)
    row2 = lambda v: v.reshape(1, -1)
    vma = jax.typeof(dy).vma
    f32 = jnp.float32

    def rowsd(width):
        return jax.ShapeDtypeStruct((m, width), y.dtype, vma=vma)

    def constd(shape):
        return jax.ShapeDtypeStruct(shape, f32, vma=vma)

    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, thresh=thresh, n_heads=n_heads,
                          seq_len=seq_len, interpret=interpret),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(m // tile,),
            in_specs=[
                _rows(tile, d),            # dy
                _rows(tile, d),            # y
                _rows(tile, d),            # mem
                _rows(tile, 3 * d),        # qkv
                _rows(tile, d),            # a1
                _rows(tile, d),            # qc
                _rows(tile, 2 * d),        # kvc
                _rows(tile, d),            # a2
                _rows(tile, ff),           # h_drop
                _rows(tile, d),            # a3
                _const((d, 3 * d)),        # wqkv
                _const((d, d)),            # wo
                _const((d, d)),            # wq
                _const((d, 2 * d)),        # wkv
                _const((d, d)),            # wo2
                _const((d, ff)),           # w1
                _const((ff, d)),           # w2
                _const((1, d)),            # g1
                _const((1, d)),            # b1
                _const((1, d)),            # g2
                _const((1, d)),            # b2
                _const((1, d)),            # g3
            ],
            out_specs=[
                _rows(tile, d),            # dx
                _rows(tile, d),            # dmem
                _const((d, 3 * d)),        # dwqkv
                _const((1, 3 * d)),        # dbqkv
                _const((d, d)),            # dwo
                _const((1, d)),            # dbo
                _const((d, d)),            # dwq
                _const((1, d)),            # dbq
                _const((d, 2 * d)),        # dwkv
                _const((1, 2 * d)),        # dbkv
                _const((d, d)),            # dwo2
                _const((1, d)),            # dbo2
                _const((1, d)),            # dg1
                _const((1, d)),            # db1
                _const((d, ff)),           # dw1
                _const((1, ff)),           # db1f
                _const((ff, d)),           # dw2
                _const((1, d)),            # db2f
                _const((1, d)),            # dg2
                _const((1, d)),            # db2
                _const((1, d)),            # dg3
                _const((1, d)),            # db3
            ],
        ),
        out_shape=[
            rowsd(d), rowsd(d),
            constd((d, 3 * d)), constd((1, 3 * d)),
            constd((d, d)), constd((1, d)),
            constd((d, d)), constd((1, d)),
            constd((d, 2 * d)), constd((1, 2 * d)),
            constd((d, d)), constd((1, d)),
            constd((1, d)), constd((1, d)),
            constd((d, ff)), constd((1, ff)),
            constd((ff, d)), constd((1, d)),
            constd((1, d)), constd((1, d)),
            constd((1, d)), constd((1, d)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * m * (3 * d * d + 3 * d * d + 2 * d * ff)
            + 24 * m * tile * d,
            bytes_accessed=2 * m * (16 * d + 2 * ff)
            + 8 * (7 * d * d + 2 * d * ff),
            transcendentals=2 * m * tile * n_heads),
        interpret=interpret,
    )(seed, dy, y, mem, qkv, a1, qc, kvc, a2, h, a3,
      wqkv, wo, wq, wkv, wo2, w1, w2,
      row2(g1), row2(b1), row2(g2), row2(b2), row2(g3))
    return outs


@functools.partial(jax.custom_vjp, nondiff_argnums=(23, 24, 25, 26))
def decoder_layer_train(y, mem, wqkv, bqkv, wo, bo, wq, bq, wkv, bkv,
                        wo2, bo2, g1, b1, w1, b1f, w2, b2f, g2, b2, g3, b3,
                        seed, rate: float, n_heads: int, seq_len: int,
                        interpret: bool = False):
    """Fused post-LN decoder layer for the training path.

    ``y``/``mem``: (rows, d) target/encoder-memory activations with rows =
    batch*seq_len in the same sequence-major order; weights in compute
    dtype, biases/LN params f32; ``seed`` an int32 (1,) array;
    ``rate``/``n_heads``/``seq_len`` static.
    """
    outs = _fwd_call(y, mem, wqkv, bqkv, wo, bo, wq, bq, wkv, bkv, wo2, bo2,
                     g1, b1, w1, b1f, w2, b2f, g2, b2, g3, b3, seed,
                     rate=rate, n_heads=n_heads, seq_len=seq_len,
                     interpret=interpret)
    return outs[0]


def _layer_fwd(y, mem, wqkv, bqkv, wo, bo, wq, bq, wkv, bkv, wo2, bo2,
               g1, b1, w1, b1f, w2, b2f, g2, b2, g3, b3, seed,
               rate, n_heads, seq_len, interpret):
    out, qkv, a1, qc, kvc, a2, h, a3 = _fwd_call(
        y, mem, wqkv, bqkv, wo, bo, wq, bq, wkv, bkv, wo2, bo2,
        g1, b1, w1, b1f, w2, b2f, g2, b2, g3, b3, seed,
        rate=rate, n_heads=n_heads, seq_len=seq_len, interpret=interpret)
    return out, (y, mem, qkv, a1, qc, kvc, a2, h, a3,
                 wqkv, wo, wq, wkv, wo2, w1, w2, g1, b1, g2, b2, g3, seed)


def _layer_bwd(rate, n_heads, seq_len, interpret, res, dy):
    (y, mem, qkv, a1, qc, kvc, a2, h, a3,
     wqkv, wo, wq, wkv, wo2, w1, w2, g1, b1, g2, b2, g3, seed) = res
    (dx, dmem, dwqkv, dbqkv, dwo, dbo, dwq, dbq, dwkv, dbkv, dwo2, dbo2,
     dg1, db1, dw1, db1f, dw2, db2f, dg2, db2, dg3, db3) = _bwd_call(
        dy, y, mem, qkv, a1, qc, kvc, a2, h, a3,
        wqkv, wo, wq, wkv, wo2, w1, w2, g1, b1, g2, b2, g3, seed,
        rate=rate, n_heads=n_heads, seq_len=seq_len, interpret=interpret)
    return (dx, dmem,
            dwqkv.astype(wqkv.dtype), dbqkv.reshape(-1),
            dwo.astype(wo.dtype), dbo.reshape(-1),
            dwq.astype(wq.dtype), dbq.reshape(-1),
            dwkv.astype(wkv.dtype), dbkv.reshape(-1),
            dwo2.astype(wo2.dtype), dbo2.reshape(-1),
            dg1.reshape(-1), db1.reshape(-1),
            dw1.astype(w1.dtype), db1f.reshape(-1),
            dw2.astype(w2.dtype), db2f.reshape(-1),
            dg2.reshape(-1), db2.reshape(-1),
            dg3.reshape(-1), db3.reshape(-1), None)


decoder_layer_train.defvjp(_layer_fwd, _layer_bwd)
