"""Pipeline parallelism for deep groove-transformer configs.

The reference has no parallelism of any kind (SURVEY.md §2.4); data and tensor
parallelism live in :mod:`.mesh`. This module adds the third axis for configs
whose *depth* outgrows one chip (the "GrooveXL" scaling probes in docs/PERF.md):
a GPipe-style microbatch pipeline over a ``("data", "pipe")`` mesh, written the
TPU way — ``jax.shard_map`` + ``lax.ppermute`` ring transfers over ICI, with
each stage holding a ``(layers_per_stage, ...)`` stacked slice of the encoder
parameters and XLA overlapping the permute with the next microbatch's compute.

Schedule: with S stages and M microbatches, step ``t`` has stage ``s`` applying
its layers to microbatch ``t - s`` (valid for ``s <= t < s + M``); the loop runs
``M + S - 1`` steps, so the bubble is the standard ``(S-1)/(M+S-1)`` fraction.
Everything thin (input embed, final norm, output head, loss) runs replicated
outside the pipelined region.

Autodiff crosses the pipeline for free: ``ppermute``'s transpose is the inverse
permutation, so ``jax.grad`` of the pipelined forward yields exact
backpropagation with the same schedule reversed (tests pin one-step SGD parity
with the single-device model).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.transformer import (
    EncoderLayer,
    GrooveTransformerConfig,
    InputLayer,
    OutputLayer,
)


@dataclasses.dataclass(frozen=True)
class PipelinePlan:
    """A ("data", "pipe"[, "model"]) mesh and the pipeline split."""

    mesh: Mesh
    n_micro: int  # microbatches per global batch

    @property
    def n_data(self) -> int:
        return self.mesh.shape["data"]

    @property
    def n_stages(self) -> int:
        return self.mesh.shape["pipe"]

    @property
    def n_model(self) -> int:
        return self.mesh.shape.get("model", 1)


def make_pipeline_mesh(n_stages: int, n_data: int | None = None,
                       n_micro: int | None = None, n_model: int = 1,
                       devices=None) -> PipelinePlan:
    """Mesh with "model" innermost (per-layer tp collectives are the hottest
    traffic), "pipe" next (one ring hop per schedule step), "data" outermost
    (one gradient all-reduce per step).

    ``n_model > 1`` adds tensor parallelism *inside* each pipeline stage: the
    full dp×pp×tp composition. The pipeline loop stays manual
    (``shard_map`` over "data"/"pipe") while the "model" axis is left to
    GSPMD — sharding constraints on each stage's layer parameters make XLA
    partition the layer matmuls and insert the tp collectives, exactly as in
    the non-pipelined tensor-parallel path (mesh.py partition rules).
    """
    devices = devices if devices is not None else jax.devices()
    if n_data is None:
        n_data = len(devices) // (n_stages * n_model)
    assert n_data >= 1, (
        f"need at least {n_stages * n_model} devices for {n_stages} stages "
        f"x {n_model} model shards, have {len(devices)}")
    n = n_data * n_stages * n_model
    assert n <= len(devices), f"need {n} devices, have {len(devices)}"
    if n < len(devices):
        # too-few-devices asserts above; too-MANY silently idling chips is
        # the invisible misconfiguration — say so
        print(f"pipeline mesh: using {n} of {len(devices)} devices "
              f"({n_data} data x {n_stages} pipe x {n_model} model); "
              f"{len(devices) - n} device(s) idle — adjust --pp_stages/"
              f"--pp_micro/--n_model_shards to use the full machine")
    dev_array = np.asarray(devices[:n]).reshape(n_data, n_stages, n_model)
    return PipelinePlan(Mesh(dev_array, axis_names=("data", "pipe", "model")),
                        n_micro=n_micro or 2 * n_stages)


def split_encoder_params(params: dict, n_layers: int):
    """(rest, stacked): per-layer subtrees stacked on a leading (L, ...) axis.

    ``stacked`` is what gets sharded over "pipe"; ``rest`` (input embed, final
    norm, output head) stays replicated.
    """
    layers = [params[f"encoder_layer_{i}"] for i in range(n_layers)]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *layers)
    rest = {k: v for k, v in params.items()
            if not k.startswith("encoder_layer_")}
    return rest, stacked


def merge_encoder_params(rest: dict, stacked, n_layers: int) -> dict:
    """Inverse of :func:`split_encoder_params` (for checkpoint interop)."""
    params = dict(rest)
    for i in range(n_layers):
        params[f"encoder_layer_{i}"] = jax.tree.map(lambda x: x[i], stacked)
    return params


def _stacked_tp_specs(stacked):
    """mesh.py tensor-parallel PartitionSpecs for the stacked layer tree.

    Leaves are the *per-layer* specs (no leading axis): callers prepend
    "pipe" (outside the shard_map) or None (inside it) for the stacked-layer
    dimension. Delegates to the same path-rule machinery the non-pipelined
    tp path uses (mesh.py::param_partition_specs works on any param subtree —
    the stacked tree's paths are the layer-relative ones the rules match)."""
    from .mesh import param_partition_specs

    return param_partition_specs(stacked)


def _stage_fn(stacked_local, h_micro, key, *, cfg: GrooveTransformerConfig,
              n_stages: int, deterministic: bool, tp_specs=None):
    """SPMD body over the "pipe" axis (runs under shard_map).

    stacked_local: (L/S, ...) this stage's layer params
    h_micro: (M, mb, T, d) embedded microbatch stream (every stage sees it;
        only stage 0 reads from it)
    tp_specs: when tensor parallelism rides inside the stage (n_model > 1 —
        the "model" mesh axis is then *auto*, not manual), a PartitionSpec
        pytree matching ``stacked_local`` that pins each layer weight's tp
        layout; GSPMD partitions the layer matmuls over "model" from these
        constraints and inserts the collectives.
    returns: (M+S-1, mb, T, d) — this stage's outputs per step; stage S-1's
        rows [S-1, S-1+M) are the pipeline's final activations.
    """
    S, M = n_stages, h_micro.shape[0]
    if tp_specs is not None:
        stacked_local = jax.tree.map(
            jax.lax.with_sharding_constraint, stacked_local, tp_specs)
    stage = jax.lax.axis_index("pipe")
    data_idx = jax.lax.axis_index("data")
    layers_per_stage = jax.tree.leaves(stacked_local)[0].shape[0]
    layer_cls = (nn.remat(EncoderLayer, static_argnums=(2,)) if cfg.remat
                 else EncoderLayer)
    layer = layer_cls(cfg.d_model, cfg.n_heads, cfg.dim_feedforward,
                      cfg.dropout, use_pallas=cfg.use_pallas_attention,
                      fused_dropout_ln=cfg.fused_dropout_ln,
                      fast_dropout=cfg.fast_dropout, dtype=cfg.compute_dtype,
                      fused_ffn=cfg.fused_ffn)
    perm = [(i, (i + 1) % S) for i in range(S)]

    def apply_local(x, step):
        def body(h, scanned):
            p, li = scanned
            rngs = None
            if not deterministic:
                # distinct stream per (data shard, global layer, schedule
                # step); step pins the microbatch, so masks are i.i.d. over
                # (sample, layer) exactly like the single-device model
                k = jax.random.fold_in(
                    jax.random.fold_in(
                        jax.random.fold_in(key, data_idx),
                        stage * layers_per_stage + li), step)
                rngs = {"dropout": k}
            return layer.apply({"params": p}, h, deterministic, rngs=rngs), None

        h, _ = jax.lax.scan(
            body, x, (stacked_local, jnp.arange(layers_per_stage)))
        return h

    def step(buf, t):
        # stage 0 consumes microbatch t (clamped: steps past M produce dead
        # values that fall outside every stage's valid window)
        inp = jnp.where(stage == 0, h_micro[jnp.minimum(t, M - 1)], buf)
        out = apply_local(inp, t)
        if tp_specs is not None:
            # activations leave each stage replicated over "model", so the
            # pipe-ring transfer ships one copy, not a tp-sharded layout
            out = jax.lax.with_sharding_constraint(out, P())
        nxt = jax.lax.ppermute(out, "pipe", perm)
        return nxt, out

    # initial carry must carry the same varying-axes type as the ppermute
    # output (device-varying over "pipe"), hence the explicit pvary
    buf0 = jax.lax.pcast(jnp.zeros_like(h_micro[0]), "pipe", to="varying")
    _, outs = jax.lax.scan(step, buf0, jnp.arange(M + S - 1))
    return outs


def pipeline_forward(params: dict, x: jax.Array, plan: PipelinePlan,
                     cfg: GrooveTransformerConfig, *,
                     deterministic: bool = True, key=None):
    """Encoder-only forward with the encoder stack pipelined over "pipe".

    ``params`` is the standard (unsplit) model tree; ``x`` is the global
    (B, T, E_src) batch with ``B`` divisible by ``n_micro * n_data``. Returns
    the usual (h_logits, v, o) heads. Numerically identical to the plain model
    in deterministic mode (tests/test_pipeline.py).
    """
    S, M = plan.n_stages, plan.n_micro
    L = cfg.num_encoder_layers
    assert L % S == 0, f"{L} layers not divisible by {S} stages"
    B, T = x.shape[0], x.shape[1]
    assert B % M == 0, f"batch {B} not divisible by {M} microbatches"
    mb = B // M
    assert mb % plan.n_data == 0, f"microbatch {mb} not divisible by data axis"
    if key is None:
        key = jax.random.PRNGKey(0)
    key_in, key = jax.random.split(key)
    rest, stacked = split_encoder_params(params, L)

    h = x.astype(cfg.compute_dtype)
    rngs = None if deterministic else {"dropout": key_in}
    h = InputLayer(cfg.d_model, cfg.dropout, cfg.max_len,
                   fast_dropout=cfg.fast_dropout,
                   dtype=cfg.compute_dtype).apply(
        {"params": rest["input"]}, h, deterministic=deterministic, rngs=rngs)

    h_micro = h.reshape(M, mb, T, cfg.d_model)
    if plan.n_model > 1:
        # dp×pp×tp: the pipeline schedule stays manual over ("data", "pipe")
        # while the "model" axis is left to GSPMD (shard_map axis_names) —
        # stage params carry the mesh.py tensor-parallel layout (leading
        # stacked-layer axis prepended) both outside the shard_map (placement)
        # and inside it (the auto-axis constraint GSPMD partitions from)
        stacked_tp_specs = _stacked_tp_specs(stacked)
        stacked_sharded = jax.tree.map(
            lambda x, s: jax.lax.with_sharding_constraint(
                x, NamedSharding(plan.mesh, P("pipe", *s))),
            stacked, stacked_tp_specs)
        tp_kwargs = dict(
            tp_specs=jax.tree.map(lambda s: P(None, *s), stacked_tp_specs))
        sm_kwargs = dict(axis_names={"data", "pipe"})
    else:
        stacked_sharded = jax.lax.with_sharding_constraint(
            stacked, NamedSharding(plan.mesh, P("pipe")))
        tp_kwargs = {}
        sm_kwargs = {}  # manual over every axis ("model" is size 1)
    outs = jax.shard_map(
        functools.partial(_stage_fn, cfg=cfg, n_stages=S,
                          deterministic=deterministic, **tp_kwargs),
        mesh=plan.mesh,
        in_specs=(P("pipe"), P(None, "data"), P()),
        out_specs=P("pipe", "data"),
        **sm_kwargs,
    )(stacked_sharded, h_micro, key)
    # outs: (S*(M+S-1), mb, T, d); stage S-1's valid rows are the final
    # activations of microbatches 0..M-1 at steps S-1..S-1+M
    base = (S - 1) * (M + S - 1) + (S - 1)
    h = jax.lax.dynamic_slice_in_dim(outs, base, M, axis=0)
    h = h.reshape(B, T, cfg.d_model)

    h = nn.LayerNorm().apply({"params": rest["encoder_norm"]}, h)
    h = h.astype(jnp.float32)
    return OutputLayer(cfg.embedding_size_tgt).apply(
        {"params": rest["output"]}, h)


def make_pipeline_step(cfg: GrooveTransformerConfig, plan: PipelinePlan,
                       tx, hit_loss_penalty: float):
    """Drop-in replacement for train.loop.make_train_step with the encoder
    stack pipelined: ``step(state, x, y, w, dropout_key) -> (state, metrics)``
    on the standard TrainState / unsplit parameter tree, with the same metric
    keys and sample-weight semantics as the plain step (it IS the plain step,
    with the pipelined forward injected). This is what makes pipeline
    parallelism reachable from the production driver (``train.py
    --pp_stages N``) rather than a library-only path.
    """
    from ..train.loop import make_train_step

    def forward(params, x, y, dropout_key):
        return pipeline_forward(params, x, plan, cfg, deterministic=False,
                                key=dropout_key)

    return make_train_step(None, tx, hit_loss_penalty, forward_fn=forward)


def check_pipeline_batch(plan: PipelinePlan, batch_size: int,
                         n_layers: int) -> None:
    """Eager validation of the static pipeline constraints, so a bad CLI
    combination fails with a clear message instead of a trace-time assert."""
    if n_layers % plan.n_stages:
        raise ValueError(
            f"num_encoder_layers {n_layers} not divisible by "
            f"--pp_stages {plan.n_stages}")
    if batch_size % plan.n_micro:
        raise ValueError(
            f"batch_size {batch_size} not divisible by n_micro "
            f"{plan.n_micro} (set --pp_micro to a divisor)")
    mb = batch_size // plan.n_micro
    if mb % plan.n_data:
        raise ValueError(
            f"microbatch {mb} (batch_size {batch_size} / n_micro "
            f"{plan.n_micro}) not divisible by the data axis {plan.n_data}")


def make_pipeline_train_step(cfg: GrooveTransformerConfig, plan: PipelinePlan,
                             tx, hit_loss_penalty: float = 1.0):
    """One jitted SGD/Adam step with the encoder stack pipelined.

    Returns ``step(params, opt_state, x, y, key) -> (params, opt_state,
    metrics)`` operating on the standard (unsplit) parameter tree, so
    checkpoints round-trip unchanged.
    """
    from ..models.losses import calculate_loss

    import optax

    def loss_fn(params, x, y, key):
        preds = pipeline_forward(params, x, plan, cfg, deterministic=False,
                                 key=key)
        out = calculate_loss(preds, y, hit_loss_penalty)
        return out.total_loss, out

    @jax.jit
    def step(params, opt_state, x, y, key):
        (_, out), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, x, y, key)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        metrics = {"loss": out.total_loss, "hit_accuracy": out.hit_accuracy}
        return params, opt_state, metrics

    return step
