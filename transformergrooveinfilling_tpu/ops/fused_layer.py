"""Whole-encoder-layer fused training kernel: ONE Pallas call per layer.

The flagship roofline (docs/PERF.md) attributes the 95k-vs-128k seqs/s gap to
dropout-mask apply/store traffic spread over four per-layer sites, and the
round-3 measurements showed every *per-site* Pallas fusion loses more at its
custom-call boundary than the fused site saves (fused_ffn −2 %, fused_ln
−11 % at the flagship config). This kernel is the composite those results
point at: the ENTIRE post-LN encoder layer —

    qkv = x·Wqkv + b                    (MXU)
    per head: P = softmax(mask(Q·Kᵀ/√hd));  A_h = drop(P)·V_h
    proj = A·Wo + b
    y1 = LN1(x + drop(proj))
    h  = drop(relu(y1·W1 + b1))
    y2 = LN2(y1 + drop(h·W2 + b2))

— runs as ONE pallas_call per layer (grid over row tiles, all six weight
matrices VMEM-resident), so a single fusion boundary is amortized over all
four dropout sites, both LayerNorms, the attention block and the FFN. Every
dropout mask comes from the in-kernel hardware PRNG (re-seeded per site from
a per-tile seed) and is REGENERATED in the backward kernel instead of ever
touching HBM. The custom VJP stores only four activation residuals (qkv,
a1, h_drop, a2): the softmax probabilities and the attention output are
recomputed in the backward — bit-exactly, since the forward derived them
from the same stored bf16 qkv — trading ~3 % extra FLOPs for ~30 % less
residual HBM traffic. The backward is a second Pallas kernel that
accumulates all weight/bias/LN gradients across row tiles in VMEM.

Attention inside the kernel uses a dense block-diagonal trick: sequences in
a row tile are concatenated, scores are computed as one (tile, tile) MXU
matmul per head, and positions from different sequences are masked to -inf
before the softmax. At tile 128 / T 32 this wastes 4x the attention FLOPs
but keeps the MXU on one large matmul instead of Bt tiny (32,128)x(128,32)
dots — and attention is ~3 % of the layer's FLOPs, so the waste is noise.
(The hot loop being beaten end-to-end is /root/reference/train.py:195-215.)

Dropout semantics match ops/dropout.py::fast_dropout (8-bit threshold,
unbiased quantized-keep rescale), with the kernel PRNG's stream (seeded per
tile x site) rather than jax.random's — dropout streams are not bit-portable
across paths anyway.

Constraints: training path only; ``d_model`` and ``dim_feedforward``
multiples of 128; per-head dim a multiple of 128 (flagship: d256/h2 → 128)
OR exactly 64 with an even head count (the lm config d256/h4 → 64): 64-wide
heads are packed two-per-128-lane group and each head's score/output
matmuls run on LANE-MASKED full-group operands — the zeroed lanes kill the
cross-head terms — so every slice stays 128-aligned for Mosaic at 2× (not
4×) attention-FLOP waste, noise at ~3 % of layer FLOPs;
``n_heads`` <= 5 (seed-site layout); rows divisible by a tile that is a
multiple of the sequence length. Interpreter mode (CPU tests) stubs the PRNG
exactly like ops/fused_ffn.py: masks keep everything (still rescaled), so
rate=0 is exact and rate>0 statistics are validated on hardware
(scripts/validate_fused_layer.py).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .dropout import quantized_threshold

_LN_EPS = 1e-5
# PRNG seed sites within one tile (stride 8 per tile): heads 0..4, then the
# three elementwise sites
_SITE_M1, _SITE_M2, _SITE_M3 = 5, 6, 7


def pick_layer_tile(rows: int, seq_len: int) -> int | None:
    """Largest row tile (multiple of seq_len, divides rows) the kernel
    supports, or None when no legal tile exists."""
    for t in (256, 128):
        if rows % t == 0 and t % seq_len == 0:
            return t
    return None


def supports_fused_layer(d_model: int, n_heads: int, dim_feedforward: int,
                         rows: int, seq_len: int) -> bool:
    """Static shape gate shared by the model dispatch and tests."""
    if not (d_model % 128 == 0 and dim_feedforward % 128 == 0
            and d_model % n_heads == 0 and n_heads <= 5
            and pick_layer_tile(rows, seq_len) is not None):
        return False
    # scoped-VMEM feasibility: the f32 multi-pass BACKWARD at ff2048
    # measured 18.0M (tile 256) / 20.6M (tile 128) scoped VMEM on v5e —
    # past the 16M limit at every tile, a compile-time OOM
    # (scripts/validate_fused_layer.py check 6's derivation). Widths past
    # ff1024 fall back to the composed path (fused_ffn still applies).
    if dim_feedforward > 1024:
        return False
    hd = d_model // n_heads
    # 128-multiple heads slice directly; 64-wide heads pack two per
    # 128-lane group (needs an even head count)
    return hd % 128 == 0 or (hd == 64 and n_heads % 2 == 0)


def _ln_stats(a):
    """f32 LayerNorm statistics: (zhat, rstd)."""
    mu = jnp.mean(a, axis=-1, keepdims=True)
    var = jnp.maximum(
        jnp.mean(jnp.square(a), axis=-1, keepdims=True) - jnp.square(mu), 0.0)
    rstd = jax.lax.rsqrt(var + _LN_EPS)
    return (a - mu) * rstd, rstd


def _make_mask(seed0, i, site, shape, thresh: int, interpret: bool,
               stride: int = 8):
    """8-bit keep mask from the per-(tile, site) PRNG stream. Interpreter
    mode keeps everything (PRNG is stubbed there) — consistent between the
    forward and backward kernels, so grads stay exact on that path.
    ``stride`` is the per-tile seed stride: 8 for this kernel (5 head sites
    + 3 elementwise), 16 for the decoder kernel's 14 sites
    (ops/fused_decoder_layer.py)."""
    if interpret:
        return jnp.ones(shape, bool)
    pltpu.prng_seed(seed0 + i * stride + site)
    bits = pltpu.prng_random_bits(shape)
    return (pltpu.bitcast(bits, jnp.uint32) & 0xFF) < thresh


def _head_groups(n_heads: int, hd: int):
    """(heads_per_group, group_width, n_groups) for the lane-group packing:
    one head per group at hd % 128 == 0, two per 128-lane group at hd 64."""
    g = 2 if hd == 64 else 1
    return g, hd * g, n_heads // g


def _lane_mask(arr, lane_group, pos: int, g: int):
    """Zero every lane of ``arr`` outside head-position ``pos`` of its
    group. Identity when the group holds a single head — the validated
    hd-128 path stays byte-identical."""
    if g == 1:
        return arr
    return jnp.where(lane_group == pos, arr, jnp.zeros((), arr.dtype))


def _block_diag_softmax(q, k, seq_len, scale, causal: bool = False):
    """One head's masked softmax over the tile's dense (tile, tile) scores —
    shared by forward and backward (the backward's recomputation is
    bit-identical because both read the same stored bf16 qkv). ``q``/``k``
    are the head's operands; when heads are lane-group packed, ``q`` is
    lane-masked so the zeroed lanes kill the other head's contraction
    terms. ``causal`` additionally masks future positions within each
    sequence (the decoder's teacher-forced self-attention)."""
    tile = q.shape[0]
    s = jnp.dot(q, k.T, preferred_element_type=jnp.float32) * scale
    row = jax.lax.broadcasted_iota(jnp.int32, (tile, tile), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (tile, tile), 1)
    valid = (row // seq_len) == (col // seq_len)
    if causal:
        valid = valid & (col % seq_len <= row % seq_len)
    s = jnp.where(valid, s, -1e30)
    s = s - jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s)
    return e / jnp.sum(e, axis=-1, keepdims=True)


def _fwd_kernel(seed_ref, x_ref, wqkv_ref, bqkv_ref, wo_ref, bo_ref,
                g1_ref, b1_ref, w1_ref, b1f_ref, w2_ref, b2f_ref,
                g2_ref, b2_ref,
                y_ref, qkv_ref, a1_ref, h_ref, a2_ref,
                *, thresh: int, n_heads: int, seq_len: int, interpret: bool):
    i = pl.program_id(0)
    seed0 = seed_ref[0]
    tile, d = x_ref.shape
    hd = d // n_heads
    keep = thresh / 256.0
    scale = 1.0 / math.sqrt(hd)
    drop = thresh < 256
    cd = x_ref.dtype

    xb = x_ref[:]
    qkv = jnp.dot(xb, wqkv_ref[:],
                  preferred_element_type=jnp.float32) + bqkv_ref[:]
    qkvc = qkv.astype(cd)
    qkv_ref[:] = qkvc

    g, gw, n_groups = _head_groups(n_heads, hd)
    attn_parts = []
    for gg in range(n_groups):
        qg = qkvc[:, gg * gw:(gg + 1) * gw]
        kg = qkvc[:, d + gg * gw:d + (gg + 1) * gw]
        vg = qkvc[:, 2 * d + gg * gw:2 * d + (gg + 1) * gw]
        lane = jax.lax.broadcasted_iota(jnp.int32, (tile, gw), 1) // hd
        acc = None
        for pos in range(g):
            hh = gg * g + pos
            p = _block_diag_softmax(_lane_mask(qg, lane, pos, g), kg,
                                    seq_len, scale)
            if drop:
                mh = _make_mask(seed0, i, hh, (tile, tile), thresh,
                                interpret)
                p = jnp.where(mh, p / keep, 0.0)
            a = jnp.dot(p.astype(cd), _lane_mask(vg, lane, pos, g),
                        preferred_element_type=jnp.float32)
            acc = a if acc is None else acc + a
        attn_parts.append(acc)
    attn = jnp.concatenate(attn_parts, axis=1).astype(cd)

    proj = jnp.dot(attn, wo_ref[:],
                   preferred_element_type=jnp.float32) + bo_ref[:]
    if drop:
        m1 = _make_mask(seed0, i, _SITE_M1, proj.shape, thresh, interpret)
        proj = jnp.where(m1, proj / keep, 0.0)
    a1 = xb.astype(jnp.float32) + proj
    a1_ref[:] = a1.astype(cd)
    zh1, _ = _ln_stats(a1)
    y1 = (zh1 * g1_ref[:] + b1_ref[:]).astype(cd)

    hpre = jnp.dot(y1, w1_ref[:],
                   preferred_element_type=jnp.float32) + b1f_ref[:]
    hrelu = jnp.maximum(hpre, 0.0)
    if drop:
        m2 = _make_mask(seed0, i, _SITE_M2, hrelu.shape, thresh, interpret)
        hrelu = jnp.where(m2, hrelu / keep, 0.0)
    hb = hrelu.astype(cd)
    h_ref[:] = hb

    f = jnp.dot(hb, w2_ref[:],
                preferred_element_type=jnp.float32) + b2f_ref[:]
    if drop:
        m3 = _make_mask(seed0, i, _SITE_M3, f.shape, thresh, interpret)
        f = jnp.where(m3, f / keep, 0.0)
    a2 = y1.astype(jnp.float32) + f
    a2_ref[:] = a2.astype(cd)
    zh2, _ = _ln_stats(a2)
    y_ref[:] = (zh2 * g2_ref[:] + b2_ref[:]).astype(cd)


def _bwd_kernel(seed_ref, dy_ref, x_ref, qkv_ref, a1_ref,
                h_ref, a2_ref, wqkv_ref, wo_ref, w1_ref, w2_ref,
                g1_ref, b1_ref, g2_ref,
                dx_ref, dwqkv_ref, dbqkv_ref, dwo_ref, dbo_ref,
                dg1_ref, db1_ref, dw1_ref, db1f_ref, dw2_ref, db2f_ref,
                dg2_ref, db2_ref,
                *, thresh: int, n_heads: int, seq_len: int, interpret: bool):
    i = pl.program_id(0)
    seed0 = seed_ref[0]
    tile, d = x_ref.shape
    hd = d // n_heads
    keep = thresh / 256.0
    scale = 1.0 / math.sqrt(hd)
    drop = thresh < 256
    cd = x_ref.dtype

    dy = dy_ref[:].astype(jnp.float32)

    # LN2 backward from the stored pre-norm activation
    a2 = a2_ref[:].astype(jnp.float32)
    zh2, rstd2 = _ln_stats(a2)
    dg2_t = jnp.sum(dy * zh2, axis=0, keepdims=True)
    db2_t = jnp.sum(dy, axis=0, keepdims=True)
    dzh2 = dy * g2_ref[:]
    da2 = rstd2 * (dzh2 - jnp.mean(dzh2, axis=-1, keepdims=True)
                   - zh2 * jnp.mean(dzh2 * zh2, axis=-1, keepdims=True))

    # residual-3 dropout (mask regenerated, never stored)
    if drop:
        m3 = _make_mask(seed0, i, _SITE_M3, da2.shape, thresh, interpret)
        df = jnp.where(m3, da2 / keep, 0.0)
    else:
        df = da2
    dfb = df.astype(cd)

    # FFN backward; h_drop > 0 recovers mask AND ReLU sign (fused_ffn trick)
    h = h_ref[:]
    dw2_t = jnp.dot(h.T, dfb, preferred_element_type=jnp.float32)
    db2f_t = jnp.sum(df, axis=0, keepdims=True)
    dhd = jnp.dot(dfb, w2_ref[:].T, preferred_element_type=jnp.float32)
    dhpre = jnp.where(h.astype(jnp.float32) > 0.0, dhd / keep, 0.0)
    dhpreb = dhpre.astype(cd)

    # recompute y1 from the stored a1
    a1 = a1_ref[:].astype(jnp.float32)
    zh1, rstd1 = _ln_stats(a1)
    y1 = (zh1 * g1_ref[:] + b1_ref[:]).astype(cd)
    dw1_t = jnp.dot(y1.T, dhpreb, preferred_element_type=jnp.float32)
    db1f_t = jnp.sum(dhpre, axis=0, keepdims=True)
    dy1 = jnp.dot(dhpreb, w1_ref[:].T,
                  preferred_element_type=jnp.float32) + da2

    # LN1 backward
    dg1_t = jnp.sum(dy1 * zh1, axis=0, keepdims=True)
    db1_t = jnp.sum(dy1, axis=0, keepdims=True)
    dzh1 = dy1 * g1_ref[:]
    da1 = rstd1 * (dzh1 - jnp.mean(dzh1, axis=-1, keepdims=True)
                   - zh1 * jnp.mean(dzh1 * zh1, axis=-1, keepdims=True))

    # residual-1 dropout
    if drop:
        m1 = _make_mask(seed0, i, _SITE_M1, da1.shape, thresh, interpret)
        dproj = jnp.where(m1, da1 / keep, 0.0)
    else:
        dproj = da1
    dprojb = dproj.astype(cd)

    # recompute the attention forward per head — bit-exact from the stored
    # bf16 qkv (same inputs, same ops as the forward kernel), so neither the
    # softmax probabilities nor the attention output ever touch HBM
    qkv = qkv_ref[:]
    g, gw, n_groups = _head_groups(n_heads, hd)
    ps, pds, mhs = [], [], []
    ah_parts = []
    for gg in range(n_groups):
        qg = qkv[:, gg * gw:(gg + 1) * gw]
        kg = qkv[:, d + gg * gw:d + (gg + 1) * gw]
        vg = qkv[:, 2 * d + gg * gw:2 * d + (gg + 1) * gw]
        lane = jax.lax.broadcasted_iota(jnp.int32, (tile, gw), 1) // hd
        acc = None
        for pos in range(g):
            hh = gg * g + pos
            p = _block_diag_softmax(_lane_mask(qg, lane, pos, g), kg,
                                    seq_len, scale)
            mh = (_make_mask(seed0, i, hh, (tile, tile), thresh, interpret)
                  if drop else None)
            pd = jnp.where(mh, p / keep, 0.0) if drop else p
            ps.append(p)
            pds.append(pd)
            mhs.append(mh)
            a = jnp.dot(pd.astype(cd), _lane_mask(vg, lane, pos, g),
                        preferred_element_type=jnp.float32)
            acc = a if acc is None else acc + a
        ah_parts.append(acc)
    attn = jnp.concatenate(ah_parts, axis=1).astype(cd)

    dwo_t = jnp.dot(attn.T, dprojb, preferred_element_type=jnp.float32)
    dbo_t = jnp.sum(dproj, axis=0, keepdims=True)
    dattn = jnp.dot(dprojb, wo_ref[:].T,
                    preferred_element_type=jnp.float32).astype(cd)

    # attention backward per head (dense block-diagonal, like the forward).
    # With lane-group packing the masked-operand identities carry over: a
    # matmul where ONE operand is zeroed outside the head's lanes equals the
    # head's narrow matmul, and masking the non-contracted operand leaves
    # the result zero outside the head's lanes, so per-head contributions
    # accumulate into the group slot by addition.
    dq_parts, dk_parts, dv_parts = [], [], []
    for gg in range(n_groups):
        qg = qkv[:, gg * gw:(gg + 1) * gw]
        kg = qkv[:, d + gg * gw:d + (gg + 1) * gw]
        vg = qkv[:, 2 * d + gg * gw:2 * d + (gg + 1) * gw]
        dag = dattn[:, gg * gw:(gg + 1) * gw]
        lane = jax.lax.broadcasted_iota(jnp.int32, (tile, gw), 1) // hd
        dqg = dkg = dvg = None
        for pos in range(g):
            hh = gg * g + pos
            dah = _lane_mask(dag, lane, pos, g)
            p, pd, mh = ps[hh], pds[hh], mhs[hh]
            dv_c = jnp.dot(pd.astype(cd).T, dah,
                           preferred_element_type=jnp.float32)
            dpd = jnp.dot(dah, vg.T, preferred_element_type=jnp.float32)
            dp = jnp.where(mh, dpd / keep, 0.0) if drop else dpd
            # softmax jacobian: invalid (cross-sequence) columns have p == 0,
            # so their dS vanishes without re-applying the block-diagonal mask
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
    dqkv = jnp.concatenate(dq_parts + dk_parts + dv_parts, axis=1)

    dbqkv_t = jnp.sum(dqkv.astype(jnp.float32), axis=0, keepdims=True)
    xb = x_ref[:]
    dwqkv_t = jnp.dot(xb.T, dqkv, preferred_element_type=jnp.float32)
    dx = da1 + jnp.dot(dqkv, wqkv_ref[:].T,
                       preferred_element_type=jnp.float32)
    dx_ref[:] = dx.astype(cd)

    @pl.when(i == 0)
    def _init():
        dwqkv_ref[:] = dwqkv_t
        dbqkv_ref[:] = dbqkv_t
        dwo_ref[:] = dwo_t
        dbo_ref[:] = dbo_t
        dg1_ref[:] = dg1_t
        db1_ref[:] = db1_t
        dw1_ref[:] = dw1_t
        db1f_ref[:] = db1f_t
        dw2_ref[:] = dw2_t
        db2f_ref[:] = db2f_t
        dg2_ref[:] = dg2_t
        db2_ref[:] = db2_t

    @pl.when(i != 0)
    def _acc():
        dwqkv_ref[:] += dwqkv_t
        dbqkv_ref[:] += dbqkv_t
        dwo_ref[:] += dwo_t
        dbo_ref[:] += dbo_t
        dg1_ref[:] += dg1_t
        db1_ref[:] += db1_t
        dw1_ref[:] += dw1_t
        db1f_ref[:] += db1f_t
        dw2_ref[:] += dw2_t
        db2f_ref[:] += db2f_t
        dg2_ref[:] += dg2_t
        db2_ref[:] += db2_t


def _const(shape):
    return pl.BlockSpec(shape, lambda i, s: tuple(0 for _ in shape),
                        memory_space=pltpu.VMEM)


def _rows(tile, width):
    return pl.BlockSpec((tile, width), lambda i, s: (i, 0),
                        memory_space=pltpu.VMEM)


def _fwd_call(x, wqkv, bqkv, wo, bo, g1, b1, w1, b1f, w2, b2f, g2, b2, seed,
              *, rate: float, n_heads: int, seq_len: int, interpret: bool):
    m, d = x.shape
    ff = w1.shape[1]
    tile = pick_layer_tile(m, seq_len)
    thresh = quantized_threshold(rate)
    row2 = lambda v: v.reshape(1, -1)
    outs = pl.pallas_call(
        functools.partial(_fwd_kernel, thresh=thresh, n_heads=n_heads,
                          seq_len=seq_len, interpret=interpret),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(m // tile,),
            in_specs=[
                _rows(tile, d),            # x
                _const((d, 3 * d)),        # wqkv
                _const((1, 3 * d)),        # bqkv
                _const((d, d)),            # wo
                _const((1, d)),            # bo
                _const((1, d)),            # g1
                _const((1, d)),            # b1
                _const((d, ff)),           # w1
                _const((1, ff)),           # b1f
                _const((ff, d)),           # w2
                _const((1, d)),            # b2f
                _const((1, d)),            # g2
                _const((1, d)),            # b2
            ],
            out_specs=[
                _rows(tile, d),            # y2
                _rows(tile, 3 * d),        # qkv
                _rows(tile, d),            # a1
                _rows(tile, ff),           # h_drop
                _rows(tile, d),            # a2
            ],
        ),
        out_shape=[
            # vma follows x: under a check_vma shard_map (the dp step,
            # train/loop.py::_make_dp_shard_step) outputs vary over the same
            # mesh axes as the sharded rows; outside shard_map it's empty
            jax.ShapeDtypeStruct((m, d), x.dtype, vma=jax.typeof(x).vma),
            jax.ShapeDtypeStruct((m, 3 * d), x.dtype, vma=jax.typeof(x).vma),
            jax.ShapeDtypeStruct((m, d), x.dtype, vma=jax.typeof(x).vma),
            jax.ShapeDtypeStruct((m, ff), x.dtype, vma=jax.typeof(x).vma),
            jax.ShapeDtypeStruct((m, d), x.dtype, vma=jax.typeof(x).vma),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * m * (3 * d * d + d * d + 2 * d * ff)
            + 4 * m * tile * d,  # dense block-diag attention (2 dots, h·hd=d)
            bytes_accessed=2 * m * (7 * d + ff)
            + 2 * (4 * d * d + 2 * d * ff),
            transcendentals=m * tile * n_heads),
        interpret=interpret,
    )(seed, x, wqkv, row2(bqkv), wo, row2(bo), row2(g1), row2(b1),
      w1, row2(b1f), w2, row2(b2f), row2(g2), row2(b2))
    return outs


def _bwd_call(dy, x, qkv, a1, h, a2, wqkv, wo, w1, w2, g1, b1, g2,
              seed, *, rate: float, n_heads: int, seq_len: int,
              interpret: bool):
    m, d = x.shape
    ff = w1.shape[1]
    tile = pick_layer_tile(m, seq_len)
    thresh = quantized_threshold(rate)
    row2 = lambda v: v.reshape(1, -1)
    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, thresh=thresh, n_heads=n_heads,
                          seq_len=seq_len, interpret=interpret),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(m // tile,),
            in_specs=[
                _rows(tile, d),            # dy
                _rows(tile, d),            # x
                _rows(tile, 3 * d),        # qkv
                _rows(tile, d),            # a1
                _rows(tile, ff),           # h_drop
                _rows(tile, d),            # a2
                _const((d, 3 * d)),        # wqkv
                _const((d, d)),            # wo
                _const((d, ff)),           # w1
                _const((ff, d)),           # w2
                _const((1, d)),            # g1
                _const((1, d)),            # b1
                _const((1, d)),            # g2
            ],
            out_specs=[
                _rows(tile, d),            # dx
                _const((d, 3 * d)),        # dwqkv
                _const((1, 3 * d)),        # dbqkv
                _const((d, d)),            # dwo
                _const((1, d)),            # dbo
                _const((1, d)),            # dg1
                _const((1, d)),            # db1
                _const((d, ff)),           # dw1
                _const((1, ff)),           # db1f
                _const((ff, d)),           # dw2
                _const((1, d)),            # db2f
                _const((1, d)),            # dg2
                _const((1, d)),            # db2
            ],
        ),
        out_shape=[
            # per-shard weight grads VARY over the dp shard_map's mesh axes
            # (each shard reduced over its own rows) — vma follows the
            # cotangent; the shard_map boundary then psums them into the
            # replicated params' cotangents. Empty outside shard_map.
            jax.ShapeDtypeStruct((m, d), x.dtype, vma=jax.typeof(dy).vma),
            jax.ShapeDtypeStruct((d, 3 * d), jnp.float32,
                                 vma=jax.typeof(dy).vma),
            jax.ShapeDtypeStruct((1, 3 * d), jnp.float32,
                                 vma=jax.typeof(dy).vma),
            jax.ShapeDtypeStruct((d, d), jnp.float32,
                                 vma=jax.typeof(dy).vma),
            jax.ShapeDtypeStruct((1, d), jnp.float32,
                                 vma=jax.typeof(dy).vma),
            jax.ShapeDtypeStruct((1, d), jnp.float32,
                                 vma=jax.typeof(dy).vma),
            jax.ShapeDtypeStruct((1, d), jnp.float32,
                                 vma=jax.typeof(dy).vma),
            jax.ShapeDtypeStruct((d, ff), jnp.float32,
                                 vma=jax.typeof(dy).vma),
            jax.ShapeDtypeStruct((1, ff), jnp.float32,
                                 vma=jax.typeof(dy).vma),
            jax.ShapeDtypeStruct((ff, d), jnp.float32,
                                 vma=jax.typeof(dy).vma),
            jax.ShapeDtypeStruct((1, d), jnp.float32,
                                 vma=jax.typeof(dy).vma),
            jax.ShapeDtypeStruct((1, d), jnp.float32,
                                 vma=jax.typeof(dy).vma),
            jax.ShapeDtypeStruct((1, d), jnp.float32,
                                 vma=jax.typeof(dy).vma),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * m * (3 * d * d + d * d + 2 * d * ff)
            + 12 * m * tile * d,  # + attention forward recompute
            bytes_accessed=2 * m * (9 * d + 2 * ff)
            + 8 * (4 * d * d + 2 * d * ff),
            transcendentals=m * tile * n_heads),
        interpret=interpret,
    )(seed, dy, x, qkv, a1, h, a2, wqkv, wo, w1, w2,
      row2(g1), row2(b1), row2(g2))
    return outs


@functools.partial(jax.custom_vjp, nondiff_argnums=(14, 15, 16, 17))
def encoder_layer_train(x, wqkv, bqkv, wo, bo, g1, b1, w1, b1f, w2, b2f,
                        g2, b2, seed, rate: float, n_heads: int,
                        seq_len: int, interpret: bool = False):
    """Fused post-LN encoder layer for the training path.

    ``x``: (rows, d) activations with rows = batch*seq_len in sequence-major
    order; weights in compute dtype, biases/LN params f32; ``seed`` an int32
    (1,) array; ``rate``/``n_heads``/``seq_len`` static.
    """
    outs = _fwd_call(x, wqkv, bqkv, wo, bo, g1, b1, w1, b1f, w2, b2f, g2, b2,
                     seed, rate=rate, n_heads=n_heads, seq_len=seq_len,
                     interpret=interpret)
    return outs[0]


def _layer_fwd(x, wqkv, bqkv, wo, bo, g1, b1, w1, b1f, w2, b2f, g2, b2, seed,
               rate, n_heads, seq_len, interpret):
    y, qkv, a1, h, a2 = _fwd_call(
        x, wqkv, bqkv, wo, bo, g1, b1, w1, b1f, w2, b2f, g2, b2, seed,
        rate=rate, n_heads=n_heads, seq_len=seq_len, interpret=interpret)
    return y, (x, qkv, a1, h, a2, wqkv, wo, w1, w2, g1, b1, g2, seed)


def _layer_bwd(rate, n_heads, seq_len, interpret, res, dy):
    (x, qkv, a1, h, a2, wqkv, wo, w1, w2, g1, b1, g2, seed) = res
    (dx, dwqkv, dbqkv, dwo, dbo, dg1, db1, dw1, db1f, dw2, db2f, dg2,
     db2) = _bwd_call(dy, x, qkv, a1, h, a2, wqkv, wo, w1, w2,
                      g1, b1, g2, seed, rate=rate, n_heads=n_heads,
                      seq_len=seq_len, interpret=interpret)
    return (dx, dwqkv.astype(wqkv.dtype), dbqkv.reshape(-1),
            dwo.astype(wo.dtype), dbo.reshape(-1),
            dg1.reshape(-1), db1.reshape(-1),
            dw1.astype(w1.dtype), db1f.reshape(-1),
            dw2.astype(w2.dtype), db2f.reshape(-1),
            dg2.reshape(-1), db2.reshape(-1), None)


encoder_layer_train.defvjp(_layer_fwd, _layer_bwd)
