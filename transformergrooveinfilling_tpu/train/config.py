"""Config system.

Accepts the reference's YAML surface unchanged (SURVEY.md §5.6): the 12
hyperparameter keys of configs/*_training.yaml, the all-or-nothing
config-file-vs-CLI rule, and paths.yaml's experiment → dataset/evaluator pickle
map. Hyperparameters map onto :class:`HyperParams`, and
:func:`derive_model_config` reproduces the derived-parameter logic of
/root/reference/train.py:115-143 (``num_decoder_layers=0`` when encoder-only,
``embedding_size_src`` 16 for MSO input vs 27 for the symbolic experiment,
``max_len=32``).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Any, Optional

import jax.numpy as jnp
import yaml

from ..models.transformer import GrooveTransformerConfig

HVO_WIDTH = 27
MSO_BANDS = 16
MAX_LEN = 32


@dataclasses.dataclass
class HyperParams:
    """The reference's hyperparameter schema (train.py:74-87 / configs)."""

    experiment: str = ""
    encoder_only: int = 1
    optimizer_algorithm: str = "sgd"
    d_model: int = 64
    n_heads: int = 16
    dropout: float = 0.2
    num_encoder_decoder_layers: int = 7
    hit_loss_penalty: float = 1.0
    batch_size: int = 16
    dim_feedforward: int = 256
    learning_rate: float = 0.05
    epochs: int = 100
    load_model: Optional[Any] = None
    notes: Optional[str] = None
    # TPU extra (not in the reference schema): matmul compute dtype.
    # None = auto (bfloat16 on TPU backends, float32 elsewhere);
    # True/False force it. docs/PERF.md "promotion trap".
    bf16: Optional[bool] = None
    # TPU extra: fused Pallas FFN kernel (ops/fused_ffn.py). None = auto —
    # on for TPU training at ff >= 2048, where it measures +16 % whole-step
    # throughput (RandomLow_lm, docs/PERF.md round 3); off at flagship
    # widths (measured negative) and off-TPU. True/False force it.
    fused_ffn: Optional[bool] = None
    # TPU extra: whole-encoder-layer fused Pallas kernel (ops/fused_layer.py:
    # attention + both LNs + FFN + all four dropout sites in one call per
    # layer, masks from in-kernel PRNG). None = auto (resolve_fused_layer,
    # policy from the measured flagship result). True/False force it.
    fused_layer: Optional[bool] = None
    # TPU extra: whole-DECODER-layer fused Pallas kernel
    # (ops/fused_decoder_layer.py: causal self-attn + cross-attn + three LN
    # sites + FFN in one call per layer). None = auto — same
    # width/topology gate as the encoder kernel, measured +25 % on the
    # flagship enc-dec step (scripts/bench_encdec.py, docs/PERF.md
    # round 4). True/False force it.
    fused_decoder_layer: Optional[bool] = None
    # TPU extra: encoder-layer rematerialization. None = auto — off unless
    # the estimated backward residuals would overflow HBM (resolve_remat;
    # remat costs +26 % at GrooveXL scale when memory does NOT force it).
    remat: Optional[bool] = None
    # TPU extra: selective-remat policy when remat engages — "dots" stores
    # matmul outputs and recomputes only elementwise chains
    # (models/transformer.py::_remat_wrap; measured at XL width in
    # scripts/bench_backward_residual.py). None = recompute everything.
    remat_policy: Optional[str] = None

    @classmethod
    def from_dict(cls, d: dict) -> "HyperParams":
        known = {f.name for f in dataclasses.fields(cls)}
        unknown = {k: v for k, v in d.items() if k not in known}
        hp = cls(**{k: v for k, v in d.items() if k in known})
        hp.extra = unknown  # keep unrecognized keys for round-tripping
        return hp

    def to_dict(self) -> dict:
        d = dataclasses.asdict(self)
        d.pop("notes", None)
        return d


def load_hyperparameters(config_path: str) -> HyperParams:
    """Load a reference-format training YAML."""
    with open(config_path) as f:
        raw = yaml.safe_load(f)
    return HyperParams.from_dict(raw)


def load_paths(paths_path: str) -> dict:
    """Load the experiment → dataset/evaluator path map (configs/paths.yaml)."""
    with open(paths_path) as f:
        return yaml.safe_load(f)


def embedding_size_src_for(experiment: str) -> int:
    """16 MSO bands for audio experiments; 27 (raw HVO) for symbolic ones
    (reference train.py:129-131; extended to cover ``*_testing`` variants)."""
    return HVO_WIDTH if "Symbolic" in experiment else MSO_BANDS


def resolve_compute_dtype(bf16: Optional[bool]):
    """bf16 hyperparameter → matmul dtype. ``None`` = auto: bfloat16 on TPU
    backends (where it is a pure throughput win, docs/PERF.md), float32
    elsewhere (CPU test parity, golden torch comparisons)."""
    if bf16 is None:
        import jax

        try:
            bf16 = jax.default_backend() == "tpu"
        except Exception:  # backend init failure → conservative default
            bf16 = False
    return jnp.bfloat16 if bf16 else jnp.float32


def resolve_fused_ffn(fused_ffn: Optional[bool], dim_feedforward: int,
                      d_model: int, compute_dtype=None) -> bool:
    """fused_ffn hyperparameter → kernel switch. ``None`` = auto: on for TPU
    training at ff >= 2048 *while the weights still fit the VMEM-resident
    kernel* (the measured win region — +16 % at RandomLow_lm's d256/ff2048,
    negative at the flagship's ff 512, and −1…−4 % at GrooveXL-class widths
    where the K/F-tiled streaming layout takes over; docs/PERF.md round 3).
    Residency is judged at the *compute* dtype the kernel will actually see
    (bf16 off doubles the weight bytes), via the same ``fits_resident``
    formula the kernel dispatch uses."""
    if fused_ffn is not None:
        return bool(fused_ffn)
    import jax
    import jax.numpy as jnp

    from ..ops.fused_ffn import fits_resident

    try:
        on_tpu = jax.default_backend() == "tpu"
    except Exception:
        on_tpu = False
    itemsize = jnp.dtype(compute_dtype or jnp.bfloat16).itemsize
    return (on_tpu and dim_feedforward >= 2048
            and fits_resident(d_model, dim_feedforward, itemsize))


def resolve_fused_layer(fused_layer: Optional[bool], d_model: int,
                        n_heads: int, dim_feedforward: int,
                        n_devices: int = 1,
                        dp_shard_ok: bool = False) -> bool:
    """fused_layer hyperparameter → whole-encoder-layer kernel switch
    (ops/fused_layer.py). ``None`` = auto: ON whenever the kernel's static
    shape gate admits the width AND the topology supports it — measured
    +26 % on the headline flagship step (96.0k → 121.4k seqs/s/chip,
    docs/PERF.md round 4) by amortizing one fusion boundary over all four
    dropout sites, both LNs, attention and the FFN.

    Topology: single-device always qualifies. A *data-parallel-only* mesh
    qualifies when the caller confirms the shard_map dp step is available
    (``dp_shard_ok`` — the driver checks dp-only + batch divisibility):
    each shard then traces a single-device program where the Pallas call is
    legal, with an explicit psum gradient all-reduce
    (train/loop.py::_make_dp_shard_step). Tensor-parallel or pipeline
    meshes keep it off: the step shards via GSPMD, which cannot partition
    an opaque custom call — it would replicate the whole layer's
    activations per chip. The kernel dispatch itself re-checks backend and
    per-batch row divisibility (EncoderLayer), so this resolves the
    width/topology gate only."""
    if fused_layer is not None:
        return bool(fused_layer)
    if not ((n_devices == 1 or dp_shard_ok)
            and d_model % 128 == 0 and dim_feedforward % 128 == 0
            and d_model % max(n_heads, 1) == 0 and n_heads <= 5):
        return False
    hd = d_model // max(n_heads, 1)
    # auto-on is measurement-gated: hd % 128 == 0 widths carry the +26 %
    # bench.py record. hd-64 lane-group packing is supported by the kernel
    # and reachable via --fused_layer 1 within its VMEM envelope (ff <=
    # 1024 -- supports_fused_layer; the lm config's ff2048 backward cannot
    # fit scoped VMEM); it joins auto once its own on-chip win is recorded
    # in docs/PERF.md.
    return hd % 128 == 0


# per-chip HBM by TPU generation, matched against the PJRT device_kind
# string (substring, first match wins — v5p before the plain-v5 kinds)
_HBM_GIB_BY_KIND = (
    ("v6", 32), ("v5p", 95), ("v5", 16), ("v4", 32), ("v3", 16), ("v2", 8),
)


def device_hbm_bytes() -> int:
    """Per-chip HBM capacity for the auto-remat estimate.

    Reads the PJRT ``device_kind`` string — a local attribute populated at
    client init — deliberately NOT ``device.memory_stats()``: that RPC hangs
    forever on tunneled backends (measured on this image's axon relay; even
    a daemon-thread probe blocks interpreter exit). ``TGI_HBM_BYTES``
    overrides (plain integer bytes; scientific notation accepted); invalid
    or non-positive values are ignored with a warning. Unknown kinds (CPU,
    new chips) fall back to the 16 GiB v5e figure."""
    env = os.environ.get("TGI_HBM_BYTES")
    if env:
        try:
            override = int(float(env))
        except ValueError:
            override = 0
        if override > 0:
            return override
        import warnings

        warnings.warn(f"ignoring invalid TGI_HBM_BYTES={env!r} "
                      "(need a positive byte count)")
    import jax

    try:
        kind = jax.devices()[0].device_kind.lower()
    except Exception:
        kind = ""
    for tag, gib in _HBM_GIB_BY_KIND:
        if tag in kind:
            return gib * 1024**3
    return 16 * 1024**3


def resolve_remat(remat: Optional[bool], *, d_model: int, n_heads: int,
                  dim_feedforward: int, n_layers: int, batch_size: int,
                  n_decoder_layers: int = 0, optimizer: str = "sgd",
                  n_data_shards: Optional[int] = None, n_replicas: int = 1,
                  max_len: int = MAX_LEN, compute_dtype=None,
                  hbm_bytes: Optional[int] = None) -> bool:
    """remat hyperparameter → layer rematerialization. ``None`` = auto:
    OFF unless the stored backward residuals would not fit HBM. Measured
    (docs/PERF.md round 3): at GrooveXL scale (d1024/ff4096/12L, bs 128) the
    activations fit v5e HBM and remat's forward replay costs 26 % — remat
    should only turn on when memory actually forces it.

    The estimate counts per-token per-layer residuals at the compute dtype
    (x into attention, packed qkv, attention probs, attention out, the two
    post-LN tensors, the FFN hidden) plus the u8 dropout masks, and budgets
    params+grads+optimizer in f32 (adam holds one more full copy than sgd);
    decoder layers cost ~2× an encoder layer (cross-attention params +
    probs on top of self-attention). ``batch_size`` is the GLOBAL batch:
    ``n_data_shards`` (default: the visible device count — the production
    driver shards the batch over every device) divides the per-device share.
    Auto-remat engages when the per-device total exceeds ~60 % of device
    memory (leaving room for XLA scratch and donation double-buffering)."""
    if remat is not None:
        return bool(remat)
    import jax
    import jax.numpy as jnp

    if n_data_shards is None:
        try:
            n_data_shards = jax.device_count()
        except Exception:
            n_data_shards = 1
    per_device_batch = max(1, batch_size // max(1, n_data_shards))
    itemsize = jnp.dtype(compute_dtype or jnp.bfloat16).itemsize
    d, ff, T = d_model, dim_feedforward, max_len
    # decoder layers: self-attn + cross-attn + FFN ≈ 2× an encoder layer in
    # both residuals and parameters
    layer_cost = n_layers + 2 * n_decoder_layers
    act_per_layer_token = (itemsize * (7 * d + ff + n_heads * T)
                           + (2 * d + ff + n_heads * T))  # + u8 masks
    act_bytes = per_device_batch * T * layer_cost * act_per_layer_token
    param_count = layer_cost * (4 * d * d + 2 * d * ff + 9 * d)
    # params + grads + momentum (sgd) / mu and nu (adam), all f32
    copies = 4 if optimizer == "adam" else 3
    static_bytes = copies * 4 * param_count
    # n_replicas: independent model copies sharing one device (the vmapped
    # batched sweep stacks K trials of params, optimizer state AND batch)
    act_bytes *= n_replicas
    static_bytes *= n_replicas
    if hbm_bytes is None:
        hbm_bytes = device_hbm_bytes()
    return act_bytes + static_bytes > 0.6 * hbm_bytes


def derive_model_config(
    hp: HyperParams, compute_dtype=None, n_devices: int = 1,
    dp_shard_ok: bool = False
) -> GrooveTransformerConfig:
    if compute_dtype is None:
        compute_dtype = resolve_compute_dtype(getattr(hp, "bf16", None))
    n_dec = 0 if hp.encoder_only else hp.num_encoder_decoder_layers
    return GrooveTransformerConfig(
        fused_ffn=resolve_fused_ffn(getattr(hp, "fused_ffn", None),
                                    hp.dim_feedforward, hp.d_model,
                                    compute_dtype),
        fused_layer=resolve_fused_layer(getattr(hp, "fused_layer", None),
                                        hp.d_model, hp.n_heads,
                                        hp.dim_feedforward,
                                        n_devices=n_devices,
                                        dp_shard_ok=dp_shard_ok),
        # auto = same width/topology gate as the encoder kernel — measured
        # +25 % on the flagship enc-dec step (37.1k → 46.3k seqs/s/chip,
        # scripts/bench_encdec.py, docs/PERF.md round 4); the dispatch
        # re-checks backend/shape, so the gate resolves width/topology only
        fused_decoder_layer=(
            resolve_fused_layer(getattr(hp, "fused_decoder_layer", None),
                                hp.d_model, hp.n_heads, hp.dim_feedforward,
                                n_devices=n_devices, dp_shard_ok=dp_shard_ok)
            if n_dec > 0 else False),
        remat=resolve_remat(getattr(hp, "remat", None),
                            d_model=hp.d_model, n_heads=hp.n_heads,
                            dim_feedforward=hp.dim_feedforward,
                            n_layers=hp.num_encoder_decoder_layers,
                            n_decoder_layers=n_dec,
                            optimizer=hp.optimizer_algorithm,
                            batch_size=hp.batch_size,
                            compute_dtype=compute_dtype),
        remat_policy=getattr(hp, "remat_policy", None),
        d_model=hp.d_model,
        n_heads=hp.n_heads,
        dim_feedforward=hp.dim_feedforward,
        dropout=hp.dropout,
        num_encoder_layers=hp.num_encoder_decoder_layers,
        num_decoder_layers=0 if hp.encoder_only else hp.num_encoder_decoder_layers,
        max_len=MAX_LEN,
        embedding_size_src=embedding_size_src_for(hp.experiment),
        embedding_size_tgt=HVO_WIDTH,
        compute_dtype=compute_dtype,
    )
