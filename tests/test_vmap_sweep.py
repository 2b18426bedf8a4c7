"""Batched (vmap) sweeps: K trials in one program."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from transformergrooveinfilling_tpu.models import build_model
from transformergrooveinfilling_tpu.models.transformer import (
    GrooveTransformerConfig,
)
from transformergrooveinfilling_tpu.train.vmap_sweep import batched_sweep

CFG = GrooveTransformerConfig(d_model=16, n_heads=2, dim_feedforward=16,
                              dropout=0.1, num_encoder_layers=1,
                              embedding_size_src=27)


def _data(rng, n=24):
    h = (rng.random((n, 32, 9)) < 0.3).astype(np.float32)
    y = np.concatenate([h, h * 0.8, h * 0.1], axis=2).astype(np.float32)
    x = y.copy()
    x[:, :, [2, 11, 20]] = 0
    return x, y


def test_batched_sweep_runs_and_differs(rng):
    x, y = _data(rng)
    model = build_model(CFG)
    params, losses = batched_sweep(
        model, CFG, x, y, lrs=[0.0, 0.02, 0.05, 0.1],
        penalties=[0.5, 0.5, 0.5, 0.5], epochs=5, batch_size=8)
    losses = np.asarray(losses)
    assert losses.shape == (4,)
    assert np.isfinite(losses).all()
    # distinct learning rates → distinct trajectories
    assert len(np.unique(np.round(losses, 6))) >= 3
    # stacked params carry the trial axis
    leaf = jax.tree_util.tree_leaves(params)[0]
    assert leaf.shape[0] == 4


def test_lr_zero_trial_keeps_init(rng):
    x, y = _data(rng)
    model = build_model(CFG)
    from transformergrooveinfilling_tpu.train.vmap_sweep import (
        init_stacked_params)

    init = init_stacked_params(model, CFG, 2, jax.random.PRNGKey(0))
    params, _ = batched_sweep(model, CFG, x, y, lrs=[0.0, 0.05],
                              penalties=[0.5, 0.5], epochs=2, batch_size=8,
                              seed=0)
    # trial 0 (lr=0) unchanged; trial 1 moved
    a0 = np.asarray(jax.tree_util.tree_leaves(params)[0][0])
    i0 = np.asarray(jax.tree_util.tree_leaves(init)[0][0])
    np.testing.assert_allclose(a0, i0, atol=1e-7)
    a1 = np.asarray(jax.tree_util.tree_leaves(params)[1][1])
    i1 = np.asarray(jax.tree_util.tree_leaves(init)[1][1])
    assert not np.allclose(a1, i1, atol=1e-7)


def test_stacked_eval_loss_matches_per_trial():
    """The vmapped full-dataset eval loss equals evaluating each stacked
    trial's parameters individually."""
    import jax
    import jax.numpy as jnp

    from transformergrooveinfilling_tpu.models import build_model
    from transformergrooveinfilling_tpu.models.losses import calculate_loss
    from transformergrooveinfilling_tpu.models.transformer import (
        GrooveTransformerConfig)
    from transformergrooveinfilling_tpu.train.vmap_sweep import (
        init_stacked_params, stacked_eval_loss)

    cfg = GrooveTransformerConfig(d_model=16, n_heads=2, dim_feedforward=16,
                                  dropout=0.0, num_encoder_layers=1,
                                  embedding_size_src=27)
    model = build_model(cfg)
    rng = np.random.default_rng(3)
    h = (rng.random((6, 32, 9)) < 0.3).astype(np.float32)
    y = np.concatenate([h, h * 0.5, h * 0.1], axis=2).astype(np.float32)
    x = y.copy()
    stacked = init_stacked_params(model, cfg, 3, jax.random.PRNGKey(0))
    pens = np.asarray([0.3, 0.6, 1.0], np.float32)

    batched = np.asarray(stacked_eval_loss(model, stacked, x, y, pens))
    for k in range(3):
        params_k = jax.tree.map(lambda a: a[k], stacked)
        pred = model.apply({"params": params_k}, jnp.asarray(x),
                           deterministic=True)
        expect = float(calculate_loss(pred, jnp.asarray(y),
                                      float(pens[k])).total_loss)
        np.testing.assert_allclose(batched[k], expect, rtol=1e-5)


def test_per_trial_dropout_rates(rng):
    """Dropout rates ride the vmap as data: trials identical except for rate
    diverge, and rate=0 lanes match a separately-trained no-dropout model's
    loss trajectory shape (finite, decreasing-ish)."""
    x, y = _data(rng)
    model = build_model(CFG)
    params, losses = batched_sweep(
        model, CFG, x, y, lrs=[0.05, 0.05, 0.05],
        penalties=[0.5, 0.5, 0.5], rates=[0.0, 0.3, 0.6],
        epochs=5, batch_size=8, seed=3)
    losses = np.asarray(losses)
    assert np.isfinite(losses).all()
    # same lr/penalty/seed, different rates → different trajectories
    assert len(np.unique(np.round(losses, 6))) == 3
    # parameters diverge across rate lanes too
    leaves = jax.tree_util.tree_leaves(params)[0]
    assert not np.allclose(np.asarray(leaves[0]), np.asarray(leaves[1]))


def test_adam_update_matches_optax():
    """The data-lr adam rule == optax.adam exactly, over several steps with
    bias correction in play (the batched sweep's adam groups must rank the
    same models the sequential optax driver would train)."""
    import optax

    from transformergrooveinfilling_tpu.train.vmap_sweep import adam_update

    rng = np.random.default_rng(3)
    params = {"a": jnp.asarray(rng.standard_normal((4, 3)), jnp.float32),
              "b": jnp.asarray(rng.standard_normal((3,)), jnp.float32)}
    lr = 0.07
    tx = optax.adam(lr)
    opt_ref = tx.init(params)
    p_ref = params
    p_mine = params
    opt_mine = (jax.tree.map(jnp.zeros_like, params),
                jax.tree.map(jnp.zeros_like, params),
                jnp.zeros((), jnp.float32))
    for step in range(5):
        grads = jax.tree.map(
            lambda p: jnp.asarray(
                rng.standard_normal(p.shape), jnp.float32), p_ref)
        updates, opt_ref = tx.update(grads, opt_ref, p_ref)
        p_ref = optax.apply_updates(p_ref, updates)
        p_mine, opt_mine = adam_update(p_mine, opt_mine, grads, lr)
        for a, b in zip(jax.tree.leaves(p_mine), jax.tree.leaves(p_ref)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-6, atol=1e-7)


def test_batched_sweep_adam(rng):
    """K adam trials in one program: finite, learning, lr-sensitive."""
    x, y = _data(rng)
    model = build_model(CFG)
    params, losses = batched_sweep(
        model, CFG, x, y, lrs=[0.0, 1e-3, 3e-3],
        penalties=[0.5, 0.5, 0.5], epochs=6, batch_size=8,
        optimizer="adam")
    losses = np.asarray(losses)
    assert np.isfinite(losses).all()
    # lr=0 trial never moves; learning trials beat it
    from transformergrooveinfilling_tpu.train.vmap_sweep import (
        stacked_eval_loss)
    ev = np.asarray(stacked_eval_loss(model, params, x, y,
                                      [0.5, 0.5, 0.5]))
    assert ev[1] < ev[0] and ev[2] < ev[0]
