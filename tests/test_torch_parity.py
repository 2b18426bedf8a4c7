"""Golden parity: JAX model ≡ reference checkpoint ≡ torch oracle.

Loads the reference demo checkpoint into (a) a torch oracle built from torch's own
nn.TransformerEncoder with reference-matching module names, and (b) the flax model
via models.torch_compat — and asserts the forward passes agree to float precision.
This pins every architectural choice (post-LN order, packed QKV layout, PE formula,
head activations) against real reference weights.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from transformergrooveinfilling_tpu.models import (
    GrooveTransformerConfig,
    build_model,
    predict,
    sinusoidal_positional_encoding,
    torch_compat,
)
from oracle import TorchGrooveTransformer, TorchGrooveTransformerEncoder

# the demo checkpoint's config = configs/InfillingClosedHH_testing_training.yaml
DEMO_CONFIG = GrooveTransformerConfig(
    d_model=32,
    n_heads=4,
    dim_feedforward=16,
    dropout=0.18,
    num_encoder_layers=6,
    max_len=32,
    embedding_size_src=16,
    embedding_size_tgt=27,
)


@pytest.fixture(scope="module")
def demo_state_dict():
    import os
    path = "/root/reference/demo/transformer_run_171tyqit_Epoch_1.Model"
    if not os.path.exists(path):
        pytest.skip("demo checkpoint unavailable")
    return torch.load(path, map_location="cpu")["model_state_dict"]


@pytest.fixture(scope="module")
def oracle(demo_state_dict):
    m = TorchGrooveTransformerEncoder(
        embedding_size_src=16, embedding_size_tgt=27, d_model=32, n_heads=4,
        dim_ff=16, dropout=0.18, n_layers=6, max_len=32,
    )
    missing, unexpected = m.load_state_dict(demo_state_dict, strict=True), None
    m.eval()
    return m


def test_pe_matches_checkpoint_buffer(demo_state_dict):
    ref_pe = demo_state_dict["InputLayerEncoder.PositionalEncoding.pe"].numpy()
    ours = np.asarray(sinusoidal_positional_encoding(32, 32))
    # float32 transcendental rounding differs slightly between torch and XLA
    np.testing.assert_allclose(ours, ref_pe, atol=5e-5)


def test_forward_parity_with_reference_weights(demo_state_dict, oracle, rng):
    params = torch_compat.state_dict_to_params(
        {k: v.numpy() for k, v in demo_state_dict.items()}, DEMO_CONFIG
    )
    model = build_model(DEMO_CONFIG)

    x = rng.standard_normal((5, 32, 16)).astype(np.float32)
    with torch.no_grad():
        th_h, th_v, th_o = oracle(torch.from_numpy(x))
    jx_h, jx_v, jx_o = model.apply({"params": params}, jnp.asarray(x),
                                   deterministic=True)
    np.testing.assert_allclose(np.asarray(jx_h), th_h.numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(jx_v), th_v.numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(jx_o), th_o.numpy(), atol=2e-5)


def test_predict_parity(demo_state_dict, oracle, rng):
    params = torch_compat.state_dict_to_params(
        {k: v.numpy() for k, v in demo_state_dict.items()}, DEMO_CONFIG
    )
    model = build_model(DEMO_CONFIG)
    x = rng.standard_normal((3, 32, 16)).astype(np.float32)
    th = oracle.predict(torch.from_numpy(x))
    jx = predict(model, params, jnp.asarray(x))
    for a, b in zip(jx, th):
        np.testing.assert_allclose(np.asarray(a), b.numpy(), atol=2e-5)


def test_state_dict_roundtrip(demo_state_dict):
    params = torch_compat.state_dict_to_params(
        {k: v.numpy() for k, v in demo_state_dict.items()}, DEMO_CONFIG
    )
    sd = torch_compat.params_to_state_dict(params, DEMO_CONFIG)
    for k, v in demo_state_dict.items():
        np.testing.assert_allclose(sd[k], v.numpy(), atol=1e-6, err_msg=k)


def test_legacy_checkpoint_io_roundtrip(tmp_path, demo_checkpoint_path):
    params, epoch, loss = torch_compat.load_legacy_checkpoint(
        demo_checkpoint_path, DEMO_CONFIG
    )
    assert epoch == 0
    assert abs(loss - 4.014834880828857) < 1e-9
    out = tmp_path / "transformer_run_test_Epoch_0.Model"
    torch_compat.save_legacy_checkpoint(str(out), params, DEMO_CONFIG, epoch, loss)
    params2, epoch2, loss2 = torch_compat.load_legacy_checkpoint(str(out), DEMO_CONFIG)
    import jax
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b, atol=1e-7), params, params2
    )
    found, ep = torch_compat.find_latest_checkpoint(str(tmp_path))
    assert found == str(out) and ep == 0


def test_random_weights_parity(rng):
    """Parity on a freshly initialized torch model (not just the demo weights),
    with a different head count / size."""
    cfg = GrooveTransformerConfig(
        d_model=64, n_heads=8, dim_feedforward=128, dropout=0.0,
        num_encoder_layers=2, embedding_size_src=27,
    )
    oracle = TorchGrooveTransformerEncoder(27, 27, 64, 8, 128, 0.0, 2, 32)
    oracle.eval()
    sd = {k: v.numpy() for k, v in oracle.state_dict().items()}
    params = torch_compat.state_dict_to_params(sd, cfg)
    model = build_model(cfg)
    x = rng.standard_normal((2, 32, 27)).astype(np.float32)
    with torch.no_grad():
        th_h, th_v, th_o = oracle(torch.from_numpy(x))
    jx_h, jx_v, jx_o = model.apply({"params": params}, jnp.asarray(x),
                                   deterministic=True)
    np.testing.assert_allclose(np.asarray(jx_h), th_h.numpy(), atol=3e-5)
    np.testing.assert_allclose(np.asarray(jx_v), th_v.numpy(), atol=3e-5)
    np.testing.assert_allclose(np.asarray(jx_o), th_o.numpy(), atol=3e-5)


def test_sgd_training_step_parity(rng):
    """Three full-batch SGD steps in both stacks from identical weights land on
    identical parameters — training dynamics, not just the forward, match."""
    import jax
    import jax.numpy as jnp
    from transformergrooveinfilling_tpu.train.loop import (
        create_train_state, make_epoch_fn, make_optimizer, TrainState)

    cfg = GrooveTransformerConfig(
        d_model=32, n_heads=4, dim_feedforward=16, dropout=0.0,
        num_encoder_layers=2, embedding_size_src=16)
    oracle = TorchGrooveTransformerEncoder(16, 27, 32, 4, 16, 0.0, 2, 32)
    oracle.train()
    sd = {k: v.numpy() for k, v in oracle.state_dict().items()}
    params = torch_compat.state_dict_to_params(sd, cfg)

    n, lr, hlp = 16, 0.05, 0.5
    x = rng.standard_normal((n, 32, 16)).astype(np.float32)
    h = (rng.random((n, 32, 9)) < 0.3).astype(np.float32)
    y = np.concatenate([h, h * 0.6, h * 0.1], axis=2).astype(np.float32)

    # torch: 3 SGD steps
    opt = torch.optim.SGD(oracle.parameters(), lr=lr)
    bce = torch.nn.BCEWithLogitsLoss(reduction="none")
    mse = torch.nn.MSELoss(reduction="none")
    xt, yt = torch.from_numpy(x), torch.from_numpy(y)
    y_h, y_v, y_o = torch.split(yt, 9, dim=2)
    pen = torch.where(y_h == 1, 1.0, hlp)
    for _ in range(3):
        opt.zero_grad()
        p_h, p_v, p_o = oracle(xt)
        loss = ((bce(p_h, y_h) * pen).sum(2).mean()
                + (mse(p_v, y_v) * pen).sum(2).mean()
                + (mse(p_o, y_o) * pen).sum(2).mean())
        loss.backward()
        opt.step()

    # jax: batch_size = n → one full-batch step per epoch; permutation is moot
    from transformergrooveinfilling_tpu.models import build_model
    model = build_model(cfg)
    tx = make_optimizer("sgd", lr)
    params_j = jax.tree.map(jnp.asarray, params)
    state = TrainState(step=jnp.zeros((), jnp.int32), params=params_j,
                       opt_state=tx.init(params_j))
    epoch_fn = make_epoch_fn(model, tx, hlp, batch_size=n, n_samples=n,
                             donate=False)
    for i in range(3):
        state, metrics = epoch_fn(state, jnp.asarray(x), jnp.asarray(y),
                                  jax.random.PRNGKey(i))

    sd_after = {k: v.detach().numpy() for k, v in oracle.state_dict().items()}
    params_torch_after = torch_compat.state_dict_to_params(sd_after, cfg)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-5),
        jax.device_get(state.params), params_torch_after)


def test_loss_curve_parity(rng):
    """BASELINE.md behavioral-parity protocol: multi-epoch training curves of
    the two stacks coincide on identical data with identical batch order
    (dropout off so randomness can't diverge the trajectories)."""
    import jax
    import jax.numpy as jnp
    from transformergrooveinfilling_tpu.train.loop import (
        make_epoch_fn, make_optimizer, TrainState)

    cfg = GrooveTransformerConfig(
        d_model=32, n_heads=4, dim_feedforward=16, dropout=0.0,
        num_encoder_layers=3, embedding_size_src=27)
    oracle = TorchGrooveTransformerEncoder(27, 27, 32, 4, 16, 0.0, 3, 32)
    sd = {k: v.numpy() for k, v in oracle.state_dict().items()}
    params = torch_compat.state_dict_to_params(sd, cfg)

    n, b, lr, hlp, epochs = 24, 8, 0.094, 0.47, 10
    h = (rng.random((n, 32, 9)) < 0.3).astype(np.float32)
    y = np.concatenate([h, h * rng.random(h.shape).astype(np.float32),
                        h * (rng.random(h.shape).astype(np.float32) - 0.5)],
                       axis=2).astype(np.float32)
    x = y.copy()
    x[:, :, [2, 11, 20]] = 0  # symbolic ClosedHH masking

    # torch curve (sequential batches, per-epoch mean loss)
    opt = torch.optim.SGD(oracle.parameters(), lr=lr)
    bce = torch.nn.BCEWithLogitsLoss(reduction="none")
    mse = torch.nn.MSELoss(reduction="none")
    torch_curve = []
    for _ in range(epochs):
        losses = []
        for i in range(0, n, b):
            xb = torch.from_numpy(x[i : i + b])
            yb = torch.from_numpy(y[i : i + b])
            y_h, y_v, y_o = torch.split(yb, 9, dim=2)
            pen = torch.where(y_h == 1, 1.0, hlp)
            opt.zero_grad()
            p_h, p_v, p_o = oracle(xb)
            loss = ((bce(p_h, y_h) * pen).sum(2).mean()
                    + (mse(p_v, y_v) * pen).sum(2).mean()
                    + (mse(p_o, y_o) * pen).sum(2).mean())
            loss.backward()
            opt.step()
            losses.append(float(loss.detach()))
        torch_curve.append(np.mean(losses))

    # jax curve (shuffle off → identical batch order)
    from transformergrooveinfilling_tpu.models import build_model
    model = build_model(cfg)
    tx = make_optimizer("sgd", lr)
    pj = jax.tree.map(jnp.asarray, params)
    state = TrainState(step=jnp.zeros((), jnp.int32), params=pj,
                       opt_state=tx.init(pj))
    epoch_fn = make_epoch_fn(model, tx, hlp, b, n, donate=False, shuffle=False)
    jax_curve = []
    for e in range(epochs):
        state, metrics = epoch_fn(state, jnp.asarray(x), jnp.asarray(y),
                                  jax.random.PRNGKey(e))
        jax_curve.append(float(metrics["loss"]))

    np.testing.assert_allclose(jax_curve, torch_curve, rtol=2e-4)
    assert jax_curve[-1] < jax_curve[0]  # it actually learned

# -- encoder-decoder family (encoder_only=0, reference train.py:125-127) ------
# No reference decoder checkpoint exists; these tests pin the adopted decoder
# semantics (post-LN torch layers, packed-kv cross-attention, zero-row
# shift-right teacher forcing) against torch's own nn.TransformerDecoder so
# nothing about the family is merely [inferred] anymore.

DEC_CONFIG = GrooveTransformerConfig(
    d_model=32, n_heads=4, dim_feedforward=16, dropout=0.0,
    num_encoder_layers=2, num_decoder_layers=2, embedding_size_src=16)


def _dec_oracle(cfg=DEC_CONFIG):
    m = TorchGrooveTransformer(
        cfg.embedding_size_src, cfg.embedding_size_tgt, cfg.d_model,
        cfg.n_heads, cfg.dim_feedforward, cfg.dropout,
        cfg.num_encoder_layers, cfg.num_decoder_layers, cfg.max_len)
    m.eval()
    return m


def _dec_data(rng, n=4, src_width=16):
    x = rng.standard_normal((n, 32, src_width)).astype(np.float32)
    h = (rng.random((n, 32, 9)) < 0.3).astype(np.float32)
    y = np.concatenate([h, h * 0.6, h * 0.1], axis=2).astype(np.float32)
    return x, y


def test_decoder_forward_parity(rng):
    oracle = _dec_oracle()
    sd = {k: v.numpy() for k, v in oracle.state_dict().items()}
    params = torch_compat.state_dict_to_params(sd, DEC_CONFIG)
    model = build_model(DEC_CONFIG)
    assert type(model).__name__ == "GrooveTransformer"

    x, y = _dec_data(rng)
    with torch.no_grad():
        th_h, th_v, th_o = oracle(torch.from_numpy(x), torch.from_numpy(y))
    jx_h, jx_v, jx_o = model.apply({"params": params}, jnp.asarray(x),
                                   jnp.asarray(y), deterministic=True)
    np.testing.assert_allclose(np.asarray(jx_h), th_h.numpy(), atol=3e-5)
    np.testing.assert_allclose(np.asarray(jx_v), th_v.numpy(), atol=3e-5)
    np.testing.assert_allclose(np.asarray(jx_o), th_o.numpy(), atol=3e-5)


def test_decoder_predict_parity(rng):
    """Inference path: tgt=None feeds an all-zeros teacher-forced grid in both
    stacks (the reference predict contract passes inputs only)."""
    oracle = _dec_oracle()
    sd = {k: v.numpy() for k, v in oracle.state_dict().items()}
    params = torch_compat.state_dict_to_params(sd, DEC_CONFIG)
    model = build_model(DEC_CONFIG)
    x, _ = _dec_data(rng)
    with torch.no_grad():
        th_h, th_v, th_o = oracle(torch.from_numpy(x))
    jx = predict(model, params, jnp.asarray(x), use_thres=False)
    np.testing.assert_allclose(
        np.asarray(jx[0]), torch.sigmoid(th_h).numpy(), atol=3e-5)
    np.testing.assert_allclose(np.asarray(jx[1]), th_v.numpy(), atol=3e-5)
    np.testing.assert_allclose(np.asarray(jx[2]), th_o.numpy(), atol=3e-5)


def test_decoder_state_dict_roundtrip():
    oracle = _dec_oracle()
    sd = {k: v.numpy() for k, v in oracle.state_dict().items()}
    params = torch_compat.state_dict_to_params(sd, DEC_CONFIG)
    back = torch_compat.params_to_state_dict(params, DEC_CONFIG)
    for k, v in sd.items():
        np.testing.assert_allclose(back[k], v, atol=1e-6, err_msg=k)


def test_decoder_sgd_training_parity(rng):
    """Three teacher-forced SGD steps land on identical parameters."""
    import jax
    from transformergrooveinfilling_tpu.train.loop import (
        TrainState, make_epoch_fn, make_optimizer)
    from oracle import torch_calculate_loss

    oracle = _dec_oracle()
    oracle.train()
    sd = {k: v.numpy() for k, v in oracle.state_dict().items()}
    params = torch_compat.state_dict_to_params(sd, DEC_CONFIG)

    n, lr, hlp = 8, 0.05, 0.5
    x, y = _dec_data(rng, n=n)
    opt = torch.optim.SGD(oracle.parameters(), lr=lr)
    xt, yt = torch.from_numpy(x), torch.from_numpy(y)
    for _ in range(3):
        opt.zero_grad()
        loss, *_ = torch_calculate_loss(oracle(xt, yt), yt, hlp)
        loss.backward()
        opt.step()

    model = build_model(DEC_CONFIG)
    tx = make_optimizer("sgd", lr)
    pj = jax.tree.map(jnp.asarray, params)
    state = TrainState(step=jnp.zeros((), jnp.int32), params=pj,
                       opt_state=tx.init(pj))
    epoch_fn = make_epoch_fn(model, tx, hlp, batch_size=n, n_samples=n,
                             donate=False, encoder_only=False)
    for i in range(3):
        state, _ = epoch_fn(state, jnp.asarray(x), jnp.asarray(y),
                            jax.random.PRNGKey(i))

    sd_after = {k: v.detach().numpy() for k, v in oracle.state_dict().items()}
    params_after = torch_compat.state_dict_to_params(sd_after, DEC_CONFIG)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-5),
        jax.device_get(state.params), params_after)


def test_decoder_loss_curve_parity(rng):
    """10-epoch teacher-forced training curves coincide (rtol 2e-4), matching
    the encoder family's behavioral-parity bar."""
    import jax
    from transformergrooveinfilling_tpu.train.loop import (
        TrainState, make_epoch_fn, make_optimizer)
    from oracle import torch_calculate_loss

    oracle = _dec_oracle()
    oracle.train()
    sd = {k: v.numpy() for k, v in oracle.state_dict().items()}
    params = torch_compat.state_dict_to_params(sd, DEC_CONFIG)

    n, b, lr, hlp, epochs = 16, 8, 0.094, 0.47, 10
    x, y = _dec_data(rng, n=n)

    opt = torch.optim.SGD(oracle.parameters(), lr=lr)
    torch_curve = []
    for _ in range(epochs):
        losses = []
        for i in range(0, n, b):
            xb, yb = torch.from_numpy(x[i:i + b]), torch.from_numpy(y[i:i + b])
            opt.zero_grad()
            loss, *_ = torch_calculate_loss(oracle(xb, yb), yb, hlp)
            loss.backward()
            opt.step()
            losses.append(float(loss.detach()))
        torch_curve.append(np.mean(losses))

    model = build_model(DEC_CONFIG)
    tx = make_optimizer("sgd", lr)
    pj = jax.tree.map(jnp.asarray, params)
    state = TrainState(step=jnp.zeros((), jnp.int32), params=pj,
                       opt_state=tx.init(pj))
    epoch_fn = make_epoch_fn(model, tx, hlp, b, n, donate=False,
                             shuffle=False, encoder_only=False)
    jax_curve = []
    for e in range(epochs):
        state, metrics = epoch_fn(state, jnp.asarray(x), jnp.asarray(y),
                                  jax.random.PRNGKey(e))
        jax_curve.append(float(metrics["loss"]))

    np.testing.assert_allclose(jax_curve, torch_curve, rtol=2e-4)
    assert jax_curve[-1] < jax_curve[0]
