"""Exported serving artifacts (export.py): StableHLO round-trip parity with
the live server, bucket routing, version guard, and the CLI entry.

The reference has no export surface (its deployment story ends at torch
checkpoints) — the parity oracle here is the package's own InfillServer,
whose predict semantics are pinned against the reference demo checkpoint in
test_torch_parity.py.
"""

import json
import zipfile

import numpy as np
import pytest


def _small_setup(encoder_only=True, seed=0):
    import jax
    import jax.numpy as jnp

    from transformergrooveinfilling_tpu.models import build_model
    from transformergrooveinfilling_tpu.models.transformer import (
        GrooveTransformerConfig,
    )

    config = GrooveTransformerConfig(
        d_model=16, n_heads=2, dim_feedforward=24, dropout=0.0,
        num_encoder_layers=2, num_decoder_layers=0 if encoder_only else 2,
        max_len=32, embedding_size_src=16)
    model = build_model(config)
    x = jnp.zeros((1, 32, 16), jnp.float32)
    params = model.init(jax.random.PRNGKey(seed), x,
                        deterministic=True)["params"]
    return config, params


def test_export_roundtrip_matches_server(tmp_path):
    from transformergrooveinfilling_tpu.export import export_infill, load_infill
    from transformergrooveinfilling_tpu.serve import InfillServer

    config, params = _small_setup()
    path = str(tmp_path / "model.tgix")
    out = export_infill(params, config, path, batch_sizes=(2, 4))
    assert out == path

    loaded = load_infill(path)
    server = InfillServer(params, config, batch_sizes=(2, 4),
                          use_pallas=False)
    rng = np.random.default_rng(0)
    # n=5 exercises pad (last chunk of 1 → bucket 2) AND chunking (4+1)
    x = rng.standard_normal((5, 32, 16)).astype(np.float32)
    got = loaded.predict(x)
    want = server.infill(x)
    assert got.shape == (5, 32, 27)
    # velocity/offset heads: numeric parity
    np.testing.assert_allclose(got[..., 9:], want[..., 9:],
                               rtol=1e-5, atol=1e-5)
    # hit head: binary parity away from the threshold knife-edge (the
    # untrained logits sit near 0 → sigmoid ≈ 0.5, where last-ulp compile
    # differences legitimately flip the comparison)
    probs = InfillServer(params, config, batch_sizes=(4,), use_thres=False,
                         use_pallas=False).infill(x)[..., :9]
    away = np.abs(probs - 0.5) > 1e-4
    np.testing.assert_array_equal(got[..., :9][away], want[..., :9][away])
    assert away.mean() > 0.9  # the knife-edge exclusion is a sliver, not a veil
    # single-item (T, E) convenience shape, exactly like the server
    np.testing.assert_allclose(loaded.predict(x[0])[..., 9:],
                               server.infill(x[0])[..., 9:],
                               rtol=1e-5, atol=1e-5)
    # hits came out thresholded
    assert set(np.unique(got[..., :9])) <= {0.0, 1.0}


def test_export_no_thres_and_encdec(tmp_path):
    from transformergrooveinfilling_tpu.export import export_infill, load_infill
    from transformergrooveinfilling_tpu.serve import InfillServer

    for encoder_only in (True, False):
        config, params = _small_setup(encoder_only=encoder_only)
        path = str(tmp_path / f"m{int(encoder_only)}.tgix")
        export_infill(params, config, path, batch_sizes=(4,),
                      use_thres=False)
        loaded = load_infill(path)
        server = InfillServer(params, config, batch_sizes=(4,),
                              use_thres=False, use_pallas=False)
        x = np.random.default_rng(1).standard_normal(
            (3, 32, 16)).astype(np.float32)
        np.testing.assert_allclose(loaded.predict(x), server.infill(x),
                                   rtol=1e-5, atol=1e-5)


def test_server_from_exported(tmp_path):
    from transformergrooveinfilling_tpu.export import export_infill
    from transformergrooveinfilling_tpu.serve import InfillServer

    config, params = _small_setup()
    path = str(tmp_path / "model.tgix")
    export_infill(params, config, path, batch_sizes=(1, 4), thres=0.4)
    server = InfillServer.from_exported(path, use_pallas=False)
    assert server.batch_sizes == [1, 4]
    assert server.thres == 0.4
    direct = InfillServer(params, config, batch_sizes=(1, 4), thres=0.4,
                          use_pallas=False)
    x = np.random.default_rng(2).standard_normal(
        (2, 32, 16)).astype(np.float32)
    np.testing.assert_allclose(server.infill(x), direct.infill(x),
                               rtol=1e-5, atol=1e-5)


def test_artifact_guards(tmp_path):
    from transformergrooveinfilling_tpu.export import load_infill, export_infill

    config, params = _small_setup()
    path = str(tmp_path / "model.tgix")
    export_infill(params, config, path, batch_sizes=(1,))

    loaded = load_infill(path)
    with pytest.raises(ValueError, match="input must be"):
        loaded.predict(np.zeros((2, 16, 16), np.float32))

    # a future artifact version must be refused, not misread
    bumped = str(tmp_path / "future.tgix")
    with zipfile.ZipFile(path) as src, zipfile.ZipFile(bumped, "w") as dst:
        for name in src.namelist():
            data = src.read(name)
            if name == "meta.json":
                meta = json.loads(data)
                meta["artifact_version"] = 999
                data = json.dumps(meta)
            dst.writestr(name, data)
    with pytest.raises(ValueError, match="version 999"):
        load_infill(bumped)

    # not-an-artifact zips are named as such
    other = str(tmp_path / "other.zip")
    with zipfile.ZipFile(other, "w") as z:
        z.writestr("hello.txt", "hi")
    with pytest.raises(ValueError, match="not an infill export artifact"):
        load_infill(other)

    # meta records the multi-platform default
    with zipfile.ZipFile(path) as z:
        meta = json.loads(z.read("meta.json"))
    assert meta["platforms"] == ["cpu", "tpu"]


def test_export_frozendict_params(tmp_path):
    """FrozenDict params must normalize to the plain-dict pytree the loader
    restores — otherwise the exported in_tree never matches at call time
    and every shipped artifact is unusable."""
    from flax.core import freeze

    from transformergrooveinfilling_tpu.export import export_infill, load_infill

    config, params = _small_setup()
    path = str(tmp_path / "frozen.tgix")
    export_infill(freeze(params), config, path, batch_sizes=(2,),
                  platforms=("cpu",))
    y = load_infill(path).predict(np.zeros((2, 32, 16), np.float32))
    assert y.shape == (2, 32, 27)


def test_export_cli_no_checkpoint(tmp_path):
    from transformergrooveinfilling_tpu import export as export_cli

    empty = tmp_path / "nothing"
    empty.mkdir()
    with pytest.raises(SystemExit, match="no checkpoint found"):
        export_cli.main(["--checkpoint", str(empty),
                         "--out", str(tmp_path / "x.tgix")])


def test_export_cli_from_checkpoint(tmp_path, capsys):
    import jax

    from transformergrooveinfilling_tpu import export as export_cli
    from transformergrooveinfilling_tpu.export import load_infill
    from transformergrooveinfilling_tpu.models import build_model
    from transformergrooveinfilling_tpu.train.checkpoint import save_checkpoint
    from transformergrooveinfilling_tpu.train.loop import (
        create_train_state, make_optimizer,
    )

    config, params = _small_setup()
    model = build_model(config)
    tx = make_optimizer("sgd", 0.1)
    state = create_train_state(model, config, tx, jax.random.PRNGKey(0))
    ckpt_dir = str(tmp_path / "ckpts")
    save_checkpoint(ckpt_dir, "testrun", 3, state, 1.25, config=config)

    out = str(tmp_path / "model.tgix")
    rc = export_cli.main(["--checkpoint", ckpt_dir, "--out", out,
                          "--batch_sizes", "1,2", "--platforms", "cpu"])
    assert rc == 0
    assert "epoch 3" in capsys.readouterr().out
    loaded = load_infill(out)
    assert loaded.batch_sizes == [1, 2]
    y = loaded.predict(np.zeros((1, 32, 16), np.float32))
    assert y.shape == (1, 32, 27)


def test_exec_device_routes_off_platform_artifact(tmp_path, monkeypatch):
    """A cpu-only artifact loaded in a session whose default backend is NOT
    cpu (the real-chip suite: axon/tpu) must route execution onto a local
    cpu device — jax.export refuses to run a lowering on a platform it was
    not exported for (the round-5 on-chip test_export failures)."""
    import jax

    from transformergrooveinfilling_tpu.export import export_infill, load_infill

    config, params = _small_setup()
    path = str(tmp_path / "cpuonly.tgix")
    export_infill(params, config, path, batch_sizes=(2,), platforms=("cpu",))
    art = load_infill(path)
    if jax.default_backend() == "cpu":
        # native backend in the artifact's platform list -> no rerouting
        assert art._exec_device() is None
        # simulate a tpu-backed session
        monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    dev = art._exec_device()
    # cpu-only artifact on a non-cpu backend (simulated or the real chip)
    assert dev is not None and dev.platform == "cpu"
    y = art.predict(np.zeros((3, 32, 16), np.float32))
    assert y.shape == (3, 32, 27)
