"""jit/pjit training loop.

The reference's hot loop is a per-batch Python loop inside torch ``train_loop``
(SURVEY.md §3.1). Here the *entire epoch* is one compiled XLA program: shuffle via
``jax.random.permutation``, batches gathered from the resident dataset arrays, and
a ``lax.scan`` over train steps — no host↔device traffic inside an epoch. Batch
tensors are sharded over the "data" mesh axis; gradient all-reduce is XLA-implicit.

Partial final batches are handled by index-padding plus zero sample weights
(static shapes everywhere; see models/losses.py::calculate_loss), matching the
reference's drop_last=False DataLoader semantics.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax
from flax import struct
from jax.sharding import NamedSharding, PartitionSpec as P

from ..models.losses import calculate_loss
from ..parallel.mesh import MeshPlan


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    opt_state: Any


def make_optimizer(algorithm: str, learning_rate: float) -> optax.GradientTransformation:
    """The reference's optimizer menu (train.py:41-42): sgd (momentum 0, as in the
    demo checkpoint) or adam."""
    if algorithm == "sgd":
        return optax.sgd(learning_rate)
    if algorithm == "adam":
        return optax.adam(learning_rate)
    raise ValueError(f"unknown optimizer_algorithm: {algorithm}")


def create_train_state(model, config, tx, rng) -> TrainState:
    """Initialize params/optimizer on the HOST CPU backend, then move the
    finished state to the default device in one transfer. Parameter init is
    trivial compute, but on a remote/tunneled accelerator each of its little
    jits (truncated_normal, fold_in, tx.init) is a remote compile — ~35 s of
    an 8-minute production run measured on the dev tunnel. CPU init + one
    batched ``device_put`` costs ~2 s and keeps per-backend determinism."""
    sample = jnp.zeros((1, config.max_len, config.embedding_size_src),
                       jnp.float32)
    if jax.default_backend() != "cpu":
        try:
            cpu = jax.local_devices(backend="cpu")[0]
        except Exception:  # no host platform registered: init on device
            cpu = None
        if cpu is not None:
            with jax.default_device(cpu):
                params = model.init(jax.device_put(rng, cpu),
                                    jax.device_put(sample, cpu),
                                    deterministic=True)["params"]
                state = TrainState(step=jnp.zeros((), jnp.int32),
                                   params=params, opt_state=tx.init(params))
            # explicit target: the arrays above are COMMITTED to the cpu
            # device, so a bare device_put would leave them there. Must be a
            # LOCAL device — jax.devices()[0] is the global list's head,
            # non-addressable on processes > 0 of a multi-host run
            return jax.device_put(state, jax.local_devices()[0])
    params = model.init(rng, sample, deterministic=True)["params"]
    return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                      opt_state=tx.init(params))


def make_train_step(model, tx, hit_loss_penalty: float,
                    encoder_only: bool = True,
                    forward_fn: Callable | None = None,
                    dp_mesh=None) -> Callable:
    """One SGD step: forward (train-mode dropout) → penalty-masked 3-term loss →
    grads → update. Returns (state, metrics-dict).

    ``encoder_only=False`` trains the encoder-decoder family with teacher
    forcing: the target grid feeds the decoder (shifted inside the model).

    ``forward_fn``: optional ``(params, x, y, dropout_key) -> preds``
    replacing the plain ``model.apply`` (the pipeline-parallel step injects
    its pipelined forward here — one copy of the grad/update/metrics body).

    ``dp_mesh``: optional ``Mesh`` with a "data" axis. When set, the
    forward/backward runs under ``jax.shard_map`` over "data" instead of
    GSPMD auto-sharding: each shard traces a SINGLE-DEVICE program — which
    makes opaque Pallas custom calls (the whole-encoder-layer fused kernel,
    ops/fused_layer.py) legal under data parallelism, where GSPMD would have
    to replicate them — and the gradient all-reduce is an explicit
    ``psum`` over "data" (the same ICI collective XLA emits for GSPMD dp).
    Params must be replicated (no tensor parallelism on this path) and the
    per-step batch must divide the "data" axis. Per-shard dropout streams
    are decorrelated by folding the shard index into the step key.
    """
    if dp_mesh is not None:
        return _make_dp_shard_step(model, tx, hit_loss_penalty, dp_mesh,
                                   encoder_only=encoder_only)

    def step(state: TrainState, x, y, w, dropout_key):
        def loss_fn(params):
            if forward_fn is not None:
                pred = forward_fn(params, x, y, dropout_key)
            else:
                args = (x,) if encoder_only else (x, y)
                pred = model.apply(
                    {"params": params}, *args, deterministic=False,
                    rngs={"dropout": dropout_key},
                )
            out = calculate_loss(pred, y, hit_loss_penalty, sample_weights=w)
            return out.total_loss, out

        grads, out = jax.grad(loss_fn, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics = {
            # global gradient norm: the scalar stand-in for the reference's
            # wandb.watch histograms (SURVEY.md §5.5)
            "grad_norm": optax.global_norm(grads),
            "loss": out.total_loss,
            "hit_accuracy": out.hit_accuracy,
            "hit_perplexity": out.hit_perplexity,
            "bce_hits": out.bce_hits,
            "mse_velocities": out.mse_velocities,
            "mse_offsets": out.mse_offsets,
        }
        return TrainState(step=state.step + 1, params=params, opt_state=opt_state), metrics

    return step


def _make_dp_shard_step(model, tx, hit_loss_penalty, mesh,
                        encoder_only: bool = True) -> Callable:
    """The shard_map data-parallel train step (see make_train_step).

    Numerics: ``calculate_loss`` normalizes by the shard's live-row count, so
    the global loss is the live-row-weighted mean of shard losses — identical
    to the single-device value (including zero-weight padding shards, where
    the guarded denominator yields a harmless 0·0 term). The gradient of that
    weighted psum-mean, psum'd across shards, equals the single-device
    gradient. ``hit_perplexity`` is exp(bce) and must be rebuilt from the
    global bce, not averaged.
    """
    import functools

    from jax.sharding import PartitionSpec  # local alias: P is module-level

    # check_vma stays ON (the default): vma tracking is what makes regular
    # autodiff all-reduce the replicated params' cotangents automatically —
    # measured bit-exact against the single-device step — and what lets the
    # grad-reduction below tell custom_vjp leaves apart. (check_vma=False
    # was measured WRONG here: no auto-reduction happens and each shard
    # updates params with its local gradient contribution, diverging
    # per-device within an epoch.)
    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(PartitionSpec(), PartitionSpec("data"),
                  PartitionSpec("data"), PartitionSpec("data"),
                  PartitionSpec()),
        out_specs=(PartitionSpec(), PartitionSpec()))
    def grads_and_metrics(params, x, y, w, dropout_key):
        key = jax.random.fold_in(dropout_key, jax.lax.axis_index("data"))

        def loss_fn(p):
            args = (x,) if encoder_only else (x, y)
            pred = model.apply({"params": p}, *args, deterministic=False,
                               rngs={"dropout": key})
            out = calculate_loss(pred, y, hit_loss_penalty, sample_weights=w)
            wsum = jnp.sum(w)
            wtot = jnp.maximum(jax.lax.psum(wsum, "data"), 1.0)
            loss = jax.lax.psum(out.total_loss * wsum, "data") / wtot
            return loss, (out, wsum, wtot)

        # Gradient all-reduce, leaf-by-leaf via the vma tags: regular
        # autodiff already psum'd the replicated params' cotangents (an
        # unconditional extra psum double-counts by n_data — caught by
        # test_dp_shard_step_matches_single_device's grad_norm check), but
        # custom_vjp layers (the fused whole-encoder-layer kernel) opt out
        # of that machinery and return per-shard weight cotangents still
        # VARYING over "data" — exactly those leaves need the explicit psum.
        grads, (out, wsum, wtot) = jax.grad(loss_fn, has_aux=True)(params)
        grads = jax.tree.map(
            lambda g: (jax.lax.psum(g, "data")
                       if "data" in jax.typeof(g).vma else g),
            grads)

        def comb(m):  # live-row-weighted global mean of a shard-mean metric
            return jax.lax.psum(m * wsum, "data") / wtot

        bce = comb(out.bce_hits)
        metrics = {
            "loss": comb(out.total_loss),
            "hit_accuracy": comb(out.hit_accuracy),
            "hit_perplexity": jnp.exp(bce),
            "bce_hits": bce,
            "mse_velocities": comb(out.mse_velocities),
            "mse_offsets": comb(out.mse_offsets),
        }
        return grads, metrics

    def step(state: TrainState, x, y, w, dropout_key):
        grads, metrics = grads_and_metrics(state.params, x, y, w, dropout_key)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics = dict(metrics, grad_norm=optax.global_norm(grads))
        return TrainState(step=state.step + 1, params=params,
                          opt_state=opt_state), metrics

    return step


def make_epoch_fn(
    model,
    tx,
    hit_loss_penalty: float,
    batch_size: int,
    n_samples: int,
    plan: MeshPlan | None = None,
    donate: bool = True,
    n_epochs: int = 1,
    shuffle: bool = True,
    encoder_only: bool = True,
    augment=None,
    augment_per_epoch: bool = True,
    step_fn=None,
    dp_shard: bool = False,
):
    """Compile a whole-epoch function ``(state, inputs, outputs, key) ->
    (state, metrics)``.

    ``n_samples`` and ``batch_size`` are static: the epoch is a ``lax.scan`` over
    ``ceil(N/B)`` steps with a permutation gather per step. Metrics are averaged
    over steps weighted by live-sample counts, so the epoch-mean loss equals the
    reference's sample-weighted mean. ``n_epochs > 1`` wraps an outer scan so
    one dispatch trains many epochs (metrics returned for the last epoch).

    ``augment``: optional jittable ``(key, inputs, outputs) -> (inputs,
    outputs)`` run INSIDE the compiled program — the fully on-device
    streaming-augmentation path (data/device_pipeline.py): callers pass the
    clean base grids as inputs/outputs and every epoch (or block, with
    ``augment_per_epoch=False``) trains on a fresh masking/render without any
    host or transfer involvement.

    ``step_fn``: optional ``(state, x, y, w, dropout_key) -> (state, metrics)``
    replacing the plain train step — how the pipeline-parallel step
    (parallel.pipeline.make_pipeline_step) rides the same epoch program.

    ``dp_shard``: run the train step under ``jax.shard_map`` over the plan's
    "data" axis instead of GSPMD auto-sharding (see make_train_step's
    ``dp_mesh``) — required for the fused whole-encoder-layer kernel on a
    data-parallel mesh. Needs ``plan`` dp-only and ``batch_size`` divisible
    by the data-axis size.
    """
    if step_fn is None:
        dp_mesh = None
        if dp_shard and plan is not None and plan.mesh.size > 1:
            assert plan.n_model == 1, \
                "dp_shard replicates params per shard; tp needs GSPMD"
            assert batch_size % plan.n_data == 0, (
                f"dp_shard: batch_size {batch_size} must divide the data "
                f"axis ({plan.n_data})")
            dp_mesh = plan.mesh
        step_fn = make_train_step(model, tx, hit_loss_penalty,
                                  encoder_only=encoder_only,
                                  dp_mesh=dp_mesh)
    n_batches = -(-n_samples // batch_size)
    padded = n_batches * batch_size

    def epoch(state: TrainState, inputs, outputs, key):
        if augment is not None and augment_per_epoch:
            aug_key, key = jax.random.split(key)
            inputs, outputs = augment(aug_key, inputs, outputs)
        perm_key, dropout_key = jax.random.split(key)
        perm = (jax.random.permutation(perm_key, n_samples) if shuffle
                else jnp.arange(n_samples))  # sequential: parity tests
        idx = jnp.concatenate(
            [perm, jnp.zeros((padded - n_samples,), perm.dtype)]
        ).reshape(n_batches, batch_size)
        weights = (
            jnp.arange(padded) < n_samples
        ).astype(jnp.float32).reshape(n_batches, batch_size)

        def body(state, batch):
            idx_b, w_b, i = batch
            x = jnp.take(inputs, idx_b, axis=0)
            y = jnp.take(outputs, idx_b, axis=0)
            if plan is not None:
                x = jax.lax.with_sharding_constraint(
                    x, NamedSharding(plan.mesh, P("data")))
                y = jax.lax.with_sharding_constraint(
                    y, NamedSharding(plan.mesh, P("data")))
            state, metrics = step_fn(
                state, x, y, w_b, jax.random.fold_in(dropout_key, i)
            )
            return state, (metrics, jnp.sum(w_b))

        state, (metrics, counts) = jax.lax.scan(
            body, state, (idx, weights, jnp.arange(n_batches))
        )
        total = jnp.sum(counts)
        mean_metrics = jax.tree.map(
            lambda m: jnp.sum(m * counts) / total, metrics
        )
        return state, mean_metrics

    # Sharding is carried by the *inputs*: callers place the dataset arrays with
    # a "data" NamedSharding and the state replicated (or tp-sharded via
    # parallel.mesh.shard_params); jit infers from the committed arguments and
    # the with_sharding_constraint above keeps batches on the data axis.
    donate_argnums = (0,) if donate else ()
    if n_epochs > 1:
        # scan over epochs inside one XLA program: amortizes host dispatch
        # (significant when the host↔device link has high latency) and lets
        # the compiler pipeline across epoch boundaries
        def multi(state, inputs, outputs, key):
            if augment is not None and not augment_per_epoch:
                aug_key, key = jax.random.split(key)
                inputs, outputs = augment(aug_key, inputs, outputs)

            def body(carry, epoch_key):
                state, metrics = epoch(carry, inputs, outputs, epoch_key)
                return state, metrics
            keys = jax.random.split(key, n_epochs)
            state, metrics = jax.lax.scan(body, state, keys)
            return state, jax.tree.map(lambda m: m[-1], metrics)

        return jax.jit(multi, donate_argnums=donate_argnums)

    def single(state, inputs, outputs, key):
        # the once-per-block augment must run even when the block is a single
        # epoch (trailing partial block, or epoch_block=1) — otherwise those
        # epochs would silently train on the clean un-augmented base grids
        if augment is not None and not augment_per_epoch:
            aug_key, key = jax.random.split(key)
            inputs, outputs = augment(aug_key, inputs, outputs)
        return epoch(state, inputs, outputs, key)

    return jax.jit(single, donate_argnums=donate_argnums)


def make_watch_fn(model, hit_loss_penalty: float, batch_size: int,
                  encoder_only: bool = True, bins: int = 64, augment=None):
    """TPU-native ``wandb.watch``: one jitted pass computing per-tensor
    histograms of the parameters and of the gradients from a representative
    batch (the reference's torch hooks log the most recent backward every
    ``log_freq`` steps, /root/reference/train.py:150 — here the extra
    forward+backward costs one step per watch event, dwarfed by the 1000-step
    cadence). Returns ``watch(params, inputs, outputs, key) ->
    {key: (counts, edges)}`` with wandb.watch's key naming
    (``gradients/<path>``, ``parameters/<path>``); the batch slice, the
    optional on-device augmentation, and the min/max bin ranges all run
    inside one compiled program, so the host only receives 64-bin summaries."""

    def _path_names(tree, prefix):
        return [
            prefix + "/" + "/".join(
                getattr(p, "key", getattr(p, "name", str(getattr(p, "idx", p))))
                for p in path)
            for path, _leaf in jax.tree_util.tree_flatten_with_path(tree)[0]
        ]

    def flatten(tree):
        return [jnp.histogram(leaf.astype(jnp.float32), bins=bins)
                for leaf in jax.tree.leaves(tree)]

    # augment only a leading window, not the whole corpus: one batch of
    # histograms needs one batch of augmented items (rounded up to the
    # on-device synth kernel's 64-item chunk alignment)
    window = batch_size if augment is None else -(-batch_size // 64) * 64

    @jax.jit
    def watch(params, inputs, outputs, key):
        inputs = inputs[:window]
        outputs = outputs[:window]
        if augment is not None:  # same front end the training step sees
            aug_key, key = jax.random.split(key)
            inputs, outputs = augment(aug_key, inputs, outputs)
        x = inputs[:batch_size]
        y = outputs[:batch_size]

        def loss_fn(p):
            args = (x,) if encoder_only else (x, y)
            pred = model.apply({"params": p}, *args, deterministic=False,
                               rngs={"dropout": key})
            return calculate_loss(pred, y, hit_loss_penalty).total_loss

        grads = jax.grad(loss_fn)(params)
        # STACKED outputs: one (n_tensors, bins) counts array + one
        # (n_tensors, bins+1) edges array. Returning ~2·n_tensors separate
        # arrays costs one device→host transfer EACH under device_get — ~5 s
        # per watch event on a tunneled link; two stacked transfers are ~ms.
        pairs = flatten(params) + flatten(grads)
        counts = jnp.stack([c for c, _e in pairs])
        edges = jnp.stack([e for _c, e in pairs])
        return counts, edges

    def watch_named(params, inputs, outputs, key):
        """``{name: (counts, edges)}`` with wandb.watch's key naming; the
        device work + the two bulk fetches happen inside."""
        counts, edges = jax.device_get(watch(params, inputs, outputs, key))
        names = (_path_names(params, "parameters")
                 + _path_names(params, "gradients"))  # grads mirror params
        return {n: (counts[i], edges[i]) for i, n in enumerate(names)}

    return watch_named


def make_eval_loss_fn(model, hit_loss_penalty: float,
                      encoder_only: bool = True):
    """Deterministic held-out loss (the val/test losses the reference's
    train_loop computes per epoch)."""

    @jax.jit
    def eval_loss(params, x, y):
        args = (x,) if encoder_only else (x, y)
        pred = model.apply({"params": params}, *args, deterministic=True)
        out = calculate_loss(pred, y, hit_loss_penalty)
        return {
            "loss": out.total_loss,
            "hit_accuracy": out.hit_accuracy,
            "bce_hits": out.bce_hits,
            "mse_velocities": out.mse_velocities,
            "mse_offsets": out.mse_offsets,
        }

    return eval_loss


def train_epoch(epoch_fn, state, inputs, outputs, key):
    """Run one compiled epoch; returns (state, host-side float metrics)."""
    state, metrics = epoch_fn(state, inputs, outputs, key)
    return state, {k: float(v) for k, v in metrics.items()}
