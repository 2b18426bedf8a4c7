"""Batched hyperparameter sweeps: K trials in one compiled program.

The reference scales out sweeps as separate wandb agent processes (SURVEY.md
§2.4) — one model per GPU at a time. On TPU, groove-sized models leave the chip
mostly idle, so this module trains **K models simultaneously with one
``jax.vmap``** over stacked parameters: K independent (learning_rate,
hit_loss_penalty, dropout) trials per program, sharing each batch's gather and
the MXU (the per-trial matmuls batch into one big one). A whole random-search
sweep becomes a single device dispatch.

Per-trial dropout rates ride the vmap as data (the 8-bit mask threshold in
ops/dropout.py is just an integer compare), so the reference sweep YAMLs'
continuous ``dropout`` distribution no longer fragments trials into singleton
architecture groups — only genuinely shape-changing parameters
(d_model/ff/heads/layers/batch) force separate compilations.

Optimizers: sgd and adam (the reference's full optimizer menu,
/root/reference/train.py:41-42). Per-trial learning rates enter the update
as *data* — sgd directly, adam via an explicit bias-corrected moment update
(identical math to ``optax.adam``'s ``scale_by_adam``; pinned by test) whose
(mu, nu, count) state is stacked on the trial axis like the parameters.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..models.losses import calculate_loss


def init_stacked_params(model, config, n_trials: int, rng):
    """K independent initializations, stacked on a leading trial axis."""
    sample = jnp.zeros((1, config.max_len, config.embedding_size_src),
                       jnp.float32)
    keys = jax.random.split(rng, n_trials)
    return jax.vmap(
        lambda k: model.init(k, sample, deterministic=True)["params"])(keys)


def adam_update(params, opt, grads, lr,
                b1: float = 0.9, b2: float = 0.999, eps: float = 1e-8):
    """One bias-corrected adam step with the learning rate as DATA.

    Identical math to ``optax.adam`` (scale_by_adam with eps_root=0 followed
    by scale(-lr)); written out so a traced per-trial ``lr`` never has to
    enter an optax schedule/state. ``opt = (mu, nu, count)``."""
    mu, nu, count = opt
    count = count + 1
    mu = jax.tree.map(lambda m, g: b1 * m + (1 - b1) * g, mu, grads)
    nu = jax.tree.map(lambda v, g: b2 * v + (1 - b2) * (g * g), nu, grads)
    c1 = 1.0 - b1 ** count
    c2 = 1.0 - b2 ** count
    params = jax.tree.map(
        lambda p, m, v: p - lr * (m / c1) / (jnp.sqrt(v / c2) + eps),
        params, mu, nu)
    return params, (mu, nu, count)


def init_stacked_opt(stacked_params, optimizer: str):
    """Stacked per-trial optimizer state: () for sgd, zeroed (mu, nu, count)
    shaped like the stacked parameters for adam."""
    if optimizer == "sgd":
        return ()
    n_trials = jax.tree.leaves(stacked_params)[0].shape[0]
    zeros = jax.tree.map(jnp.zeros_like, stacked_params)
    return (zeros, jax.tree.map(jnp.zeros_like, stacked_params),
            jnp.zeros((n_trials,), jnp.float32))


def make_batched_sweep_fn(model, batch_size: int, n_samples: int,
                          n_epochs: int, encoder_only: bool = True,
                          config=None, rates_as_data: bool = True,
                          optimizer: str = "sgd"):
    """Compile ``(stacked_params, stacked_opt, lrs, penalties, rates, inputs,
    outputs, key) -> (stacked_params, final_losses)``.

    Every trial sees the same shuffled batches; dropout streams differ per
    trial (fold_in on the trial index). With ``rates_as_data`` (per-trial
    dropout rates), the model is rebuilt inside the vmapped step with the
    traced rate as its dropout attribute — a non-static rate routes every
    dropout site through the fast 8-bit path on its own (models/transformer
    ``Dropout``), so the config's ``fast_dropout`` preference is never
    overridden for static-rate sweeps: pass ``rates_as_data=False`` when all
    trials share one rate and the model's configured dropout path (flax
    ``nn.Dropout`` included) is used bit-for-bit as in the sequential runner.
    """
    from ..models import build_model

    if optimizer not in ("sgd", "adam"):
        raise ValueError(f"unknown optimizer_algorithm: {optimizer}")
    n_batches = -(-n_samples // batch_size)
    padded = n_batches * batch_size

    def trial_step(params, opt, lr, penalty, rate, x, y, w, dropout_key):
        model_t = model
        if config is not None and rates_as_data:
            model_t = build_model(dataclasses.replace(config, dropout=rate))

        def loss_fn(p):
            args = (x,) if encoder_only else (x, y)
            pred = model_t.apply({"params": p}, *args, deterministic=False,
                                 rngs={"dropout": dropout_key})
            return calculate_loss(pred, y, penalty, sample_weights=w).total_loss

        loss, grads = jax.value_and_grad(loss_fn)(params)
        if optimizer == "adam":
            params, opt = adam_update(params, opt, grads, lr)
        else:
            params = jax.tree.map(lambda p, g: p - lr * g, params, grads)
        return params, opt, loss

    def sweep(stacked_params, stacked_opt, lrs, penalties, rates,
              inputs, outputs, key):
        def epoch(carry, epoch_key):
            stacked, opt = carry
            perm_key, dropout_key = jax.random.split(epoch_key)
            perm = jax.random.permutation(perm_key, n_samples)
            idx = jnp.concatenate(
                [perm, jnp.zeros((padded - n_samples,), perm.dtype)]
            ).reshape(n_batches, batch_size)
            weights = (jnp.arange(padded) < n_samples).astype(
                jnp.float32).reshape(n_batches, batch_size)

            def body(carry_b, batch):
                stacked, opt = carry_b
                idx_b, w_b, i = batch
                x = jnp.take(inputs, idx_b, axis=0)
                y = jnp.take(outputs, idx_b, axis=0)
                n_trials = lrs.shape[0]
                keys = jax.vmap(
                    lambda t: jax.random.fold_in(
                        jax.random.fold_in(dropout_key, i), t)
                )(jnp.arange(n_trials))
                stacked, opt, losses = jax.vmap(
                    trial_step, in_axes=(0, 0, 0, 0, 0, None, None, None, 0)
                )(stacked, opt, lrs, penalties, rates, x, y, w_b, keys)
                return (stacked, opt), losses

            (stacked, opt), losses = jax.lax.scan(
                body, (stacked, opt), (idx, weights, jnp.arange(n_batches)))
            return (stacked, opt), losses[-1]  # (K,) last-batch losses

        keys = jax.random.split(key, n_epochs)
        (stacked_params, _), losses = jax.lax.scan(
            epoch, (stacked_params, stacked_opt), keys)
        return stacked_params, losses[-1]

    return jax.jit(sweep)


def batched_sweep(model, config, inputs, outputs, lrs, penalties,
                  epochs: int, batch_size: int, seed: int = 0, rates=None,
                  optimizer: str = "sgd"):
    """Run K sgd/adam trials in one program → (stacked_params, final_losses).

    ``rates``: optional per-trial dropout rates (defaults to the config's
    rate for every trial). Uniform rates stay static — the model keeps its
    configured dropout path (incl. ``fast_dropout=False``); only genuinely
    per-trial rates ride the vmap as data."""
    import numpy as np

    from ..models import build_model

    lrs = jnp.asarray(lrs, jnp.float32)
    penalties = jnp.asarray(penalties, jnp.float32)
    assert lrs.shape == penalties.shape
    rates = (jnp.full_like(lrs, config.dropout) if rates is None
             else jnp.asarray(rates, jnp.float32))
    assert rates.shape == lrs.shape
    rates_np = np.asarray(rates)
    uniform = bool(np.all(rates_np == rates_np[0]))
    if uniform and float(rates_np[0]) != config.dropout:
        config = dataclasses.replace(config, dropout=float(rates_np[0]))
        model = build_model(config)
    stacked = init_stacked_params(model, config, lrs.shape[0],
                                  jax.random.PRNGKey(seed))
    fn = make_batched_sweep_fn(model, batch_size, inputs.shape[0], epochs,
                               encoder_only=config.encoder_only,
                               config=config, rates_as_data=not uniform,
                               optimizer=optimizer)
    return fn(stacked, init_stacked_opt(stacked, optimizer), lrs, penalties,
              rates, jnp.asarray(inputs), jnp.asarray(outputs),
              jax.random.PRNGKey(seed + 1))


def stacked_eval_loss(model, stacked_params, inputs, outputs, penalties,
                      encoder_only: bool = True):
    """Deterministic full-dataset loss per trial: one vmapped forward over
    the K stacked parameter trees. This is the rankable number — the
    last-training-batch loss depends on which samples landed in the final
    batch, whereas this matches the sequential runner's logged loss
    semantics (whole dataset, dropout off)."""
    inputs = jnp.asarray(inputs)
    outputs = jnp.asarray(outputs)
    penalties = jnp.asarray(penalties, jnp.float32)

    def one(params, penalty):
        args = (inputs,) if encoder_only else (inputs, outputs)
        pred = model.apply({"params": params}, *args, deterministic=True)
        return calculate_loss(pred, outputs, penalty).total_loss

    return jax.jit(jax.vmap(one))(stacked_params, penalties)
