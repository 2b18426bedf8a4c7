"""Serving: fused attention parity, bucketing, HTTP endpoint."""

import json
import urllib.request

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from transformergrooveinfilling_tpu.models import build_model
from transformergrooveinfilling_tpu.models.transformer import (
    GrooveTransformerConfig,
)
from transformergrooveinfilling_tpu.ops.attention import fused_mha, mha_reference
from transformergrooveinfilling_tpu.serve import InfillServer, latency_benchmark

CFG = GrooveTransformerConfig(
    d_model=32, n_heads=4, dim_feedforward=16, dropout=0.0,
    num_encoder_layers=2, embedding_size_src=16)


def test_fused_mha_matches_reference(rng):
    q = jnp.asarray(rng.standard_normal((2, 4, 32, 16)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((2, 4, 32, 16)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((2, 4, 32, 16)), jnp.float32)
    ref = mha_reference(q, k, v)
    out = fused_mha(q, k, v, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_model_with_pallas_attention_matches_einsum(rng):
    import dataclasses

    model = build_model(CFG)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 16)),
                        deterministic=True)["params"]
    x = jnp.asarray(rng.standard_normal((3, 32, 16)), jnp.float32)
    base = model.apply({"params": params}, x, deterministic=True)

    cfg_p = dataclasses.replace(CFG, use_pallas_attention=True)
    model_p = build_model(cfg_p)
    out = model_p.apply({"params": params}, x, deterministic=True)
    for a, b in zip(out, base):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-5)


@pytest.fixture(scope="module")
def server():
    model = build_model(CFG)
    params = model.init(jax.random.PRNGKey(1), jnp.zeros((1, 32, 16)),
                        deterministic=True)["params"]
    return InfillServer(params, CFG, batch_sizes=(1, 4), use_pallas=False)


def test_infill_shapes(server, rng):
    x = rng.standard_normal((32, 16)).astype(np.float32)
    out = server.infill(x)
    assert out.shape == (32, 27)
    h = out[..., :9]
    assert set(np.unique(h)).issubset({0.0, 1.0})

    batch = rng.standard_normal((6, 32, 16)).astype(np.float32)
    outb = server.infill(batch)  # 6 → bucket 4 + bucket 4(padded 2)
    assert outb.shape == (6, 32, 27)
    # same inputs give same outputs regardless of bucketing
    np.testing.assert_allclose(server.infill(batch[:1])[0], outb[0], atol=1e-6)


def test_latency_benchmark_runs(server):
    stats = latency_benchmark(server, n_requests=5)
    assert np.isfinite(stats["p50_ms"])


def test_http_endpoint(server, rng):
    httpd = server.serve_http(port=0, block=False)
    port = httpd.server_address[1]

    # zero-request server: /healthz must be STRICT json (percentiles null,
    # never a bare NaN literal — json.loads accepts NaN but JSON.parse
    # rejects it). The module fixture accumulates stats across tests, so
    # probe a fresh server sharing the same params.
    from transformergrooveinfilling_tpu.serve import InfillServer

    fresh_srv = InfillServer(server.params, server.config, batch_sizes=(1,),
                             use_pallas=False)
    fresh_httpd = fresh_srv.serve_http(port=0, block=False)
    try:
        with urllib.request.urlopen(
                f"http://127.0.0.1:{fresh_httpd.server_address[1]}/healthz",
                timeout=30) as resp:
            raw = resp.read()
        assert b"NaN" not in raw
        fresh = json.loads(raw)
        assert fresh["ok"] and fresh["count"] == 0
        assert fresh["p50_ms"] is None and fresh["p99_ms"] is None
    finally:
        fresh_httpd.shutdown()

    x = rng.standard_normal((32, 16)).tolist()
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/infill",
        data=json.dumps({"input": x}).encode(),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=30) as resp:
        payload = json.loads(resp.read())
    assert np.asarray(payload["hvo"]).shape == (32, 27)

    with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/healthz", timeout=30) as resp:
        health = json.loads(resp.read())
    assert health["ok"] and health["count"] >= 1
    httpd.shutdown()


def test_multi_task_server(rng):
    import dataclasses
    from transformergrooveinfilling_tpu.serve import MultiTaskServer

    cfg_audio = CFG  # 16-wide MSO input
    cfg_sym = dataclasses.replace(CFG, embedding_size_src=27)
    bundles = {}
    for name, cfg in (("InfillingRandom", cfg_audio),
                      ("InfillingClosedHH_Symbolic", cfg_sym)):
        m = build_model(cfg)
        p = m.init(jax.random.PRNGKey(0),
                   jnp.zeros((1, 32, cfg.embedding_size_src)),
                   deterministic=True)["params"]
        bundles[name] = (p, cfg)
    mts = MultiTaskServer(bundles, batch_sizes=(1,), use_pallas=False)

    out_a = mts.infill("InfillingRandom",
                       rng.standard_normal((32, 16)).astype(np.float32))
    out_s = mts.infill("InfillingClosedHH_Symbolic",
                       rng.standard_normal((32, 27)).astype(np.float32))
    assert out_a.shape == out_s.shape == (32, 27)
    with pytest.raises(KeyError):
        mts.infill("Nope", np.zeros((32, 16), np.float32))
    stats = mts.stats()
    assert stats["InfillingRandom"]["count"] == 1

    import json as _json
    import urllib.request
    httpd = mts.serve_http(port=0, block=False)
    port = httpd.server_address[1]
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/infill",
        data=_json.dumps({
            "experiment": "InfillingRandom",
            "input": rng.standard_normal((32, 16)).tolist()}).encode(),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=30) as resp:
        payload = _json.loads(resp.read())
    assert np.asarray(payload["hvo"]).shape == (32, 27)
    httpd.shutdown()


def test_http_midi_export(server, rng):
    """POST /infill with format=midi returns a parseable SMF of the result."""
    import base64
    from transformergrooveinfilling_tpu.data.midi import parse_midi

    httpd = server.serve_http(port=0, block=False)
    port = httpd.server_address[1]
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/infill",
        data=json.dumps({"input": rng.standard_normal((32, 16)).tolist(),
                         "format": "midi", "qpm": 95}).encode(),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=30) as resp:
        payload = json.loads(resp.read())
    blob = base64.b64decode(payload["midi_base64"])
    mid = parse_midi(blob)
    assert abs(60e6 / mid["tempi"][0][1] - 95) < 0.5
    httpd.shutdown()


def test_infill_from_hvo_audio_model(rng):
    """Audio-modality serving: partial HVO → server-side synth+MSO → infill."""
    from transformergrooveinfilling_tpu.data.synthetic import (
        synthetic_gmd_sequences)

    model = build_model(CFG)  # CFG is 16-wide (audio-modality input)
    params = model.init(jax.random.PRNGKey(2), jnp.zeros((1, 32, 16)),
                        deterministic=True)["params"]
    srv = InfillServer(params, CFG, batch_sizes=(1,), use_pallas=False)
    seq = synthetic_gmd_sequences(1, seed=3)[0]
    partial, _ = seq.reset_voices([2])
    out = srv.infill_from_hvo(partial.hvo, qpm=seq.tempos[0].qpm)
    assert out.shape == (32, 27)

    # and over HTTP
    httpd = srv.serve_http(port=0, block=False)
    port = httpd.server_address[1]
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/infill",
        data=json.dumps({"hvo_input": partial.hvo.tolist(),
                         "qpm": seq.tempos[0].qpm}).encode(),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=60) as resp:
        payload = json.loads(resp.read())
    assert np.asarray(payload["hvo"]).shape == (32, 27)
    httpd.shutdown()


def test_coalescing_matches_direct(rng):
    """Dynamic batching must be invisible: per-request results under
    concurrency equal the non-coalesced path, errors propagate per-caller."""
    import threading

    model = build_model(CFG)
    params = model.init(jax.random.PRNGKey(2), jnp.zeros((1, 32, 16)),
                        deterministic=True)["params"]
    direct = InfillServer(params, CFG, batch_sizes=(1, 8), use_pallas=False)
    coal = InfillServer(params, CFG, batch_sizes=(1, 8), use_pallas=False,
                        coalesce=True, coalesce_wait_ms=5.0)

    xs = [rng.standard_normal((32, 16)).astype(np.float32) for _ in range(12)]
    want = [direct.infill(x) for x in xs]
    got = [None] * len(xs)
    errs = []

    def worker(i):
        try:
            got[i] = coal.infill(xs[i])
        except Exception as e:  # pragma: no cover
            errs.append(e)

    threads = [threading.Thread(target=worker, args=(i,))
               for i in range(len(xs))]
    [t.start() for t in threads]
    [t.join() for t in threads]
    assert not errs
    for w, g in zip(want, got):
        np.testing.assert_allclose(g, w, atol=1e-6)
    assert coal.stats.count == len(xs)

    # bad input raises in the submitting caller, not the dispatcher
    with pytest.raises(ValueError):
        coal.infill(np.zeros((5, 5), np.float32))


def test_multi_chunk_request_over_largest_bucket(server, rng):
    """N greater than the largest bucket splits into pipelined chunk
    dispatches; results must equal per-item inference."""
    x = rng.standard_normal((11, 32, 16)).astype(np.float32)  # buckets (1, 4)
    out = server.infill(x)
    assert out.shape == (11, 32, 27)
    per_item = np.concatenate([server.infill(x[i : i + 1]) for i in range(11)])
    np.testing.assert_allclose(out, per_item, atol=1e-6)


def test_coalescer_failure_keeps_released_results():
    """A failure partway through distributing a batch must not turn already-
    released successes into errors (holder['out'] wins over late 'err')."""
    import threading

    from transformergrooveinfilling_tpu.serve import _Coalescer

    class FlakyServer:
        batch_sizes = (8,)

        def _predict_batched(self, x):
            out = np.ones((x.shape[0], 32, 27), np.float32)
            if x.shape[0] > 1:
                # deliver the first caller's slice, then die mid-distribution
                raise RuntimeError("mid-distribution failure")
            return out

    coal = _Coalescer(FlakyServer(), max_wait_ms=30.0)
    results, errors = [], []

    def worker():
        try:
            results.append(coal.submit(np.zeros((1, 32, 16), np.float32)))
        except RuntimeError as e:
            errors.append(e)

    threads = [threading.Thread(target=worker) for _ in range(4)]
    [t.start() for t in threads]
    [t.join() for t in threads]
    # every caller in the failed batch gets the error, none hang, and the
    # invariant holds: no caller observes both an error and a result
    assert len(errors) + len(results) == 4
    assert errors, "the batch failure must propagate to its waiters"


def test_fused_mha_causal_matches_masked_reference(rng):
    """The in-kernel causal mask (decoder self-attention under use_pallas)
    equals the einsum path with an explicit tril mask."""
    import math

    q = jnp.asarray(rng.standard_normal((2, 4, 32, 16)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((2, 4, 32, 16)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((2, 4, 32, 16)), jnp.float32)
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k) / math.sqrt(16)
    tril = jnp.tril(jnp.ones((32, 32), bool))
    s = jnp.where(tril, s, -1e9)
    ref = jnp.einsum("bhqk,bhkd->bhqd", jax.nn.softmax(s, axis=-1), v)
    out = fused_mha(q, k, v, interpret=True, causal=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_encdec_with_pallas_attention_matches_einsum(rng):
    """Decoder family honors use_pallas_attention (VERDICT r2 directive #5):
    causal self-attn + cross-attn through the kernel equal the einsum path."""
    import dataclasses

    cfg = dataclasses.replace(CFG, num_decoder_layers=2)
    model = build_model(cfg)
    x = jnp.asarray(rng.standard_normal((3, 32, 16)), jnp.float32)
    y = jnp.asarray((rng.random((3, 32, 27)) < 0.3), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 16)),
                        deterministic=True)["params"]
    base = model.apply({"params": params}, x, y, deterministic=True)
    model_p = build_model(dataclasses.replace(
        cfg, use_pallas_attention=True))
    out = model_p.apply({"params": params}, x, y, deterministic=True)
    for a, b in zip(out, base):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-5)


def test_serve_cli_artifact_branch(tmp_path, monkeypatch, capsys):
    """``python -m ...serve --artifact model.tgix`` builds the server from an
    exported artifact; --ckpt/--artifact are mutually exclusive and one is
    required."""
    import pytest

    from transformergrooveinfilling_tpu import serve as serve_mod
    from transformergrooveinfilling_tpu.export import export_infill
    from transformergrooveinfilling_tpu.models import build_model
    from transformergrooveinfilling_tpu.models.transformer import (
        GrooveTransformerConfig,
    )

    config = GrooveTransformerConfig(
        d_model=16, n_heads=2, dim_feedforward=24, dropout=0.0,
        num_encoder_layers=1, max_len=32, embedding_size_src=16)
    model = build_model(config)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 16)),
                        deterministic=True)["params"]
    path = str(tmp_path / "m.tgix")
    export_infill(params, config, path, batch_sizes=(1,), platforms=("cpu",))

    served = {}
    monkeypatch.setattr(
        serve_mod.InfillServer, "serve_http",
        lambda self, **kw: served.update(srv=self, kw=kw))
    serve_mod.main(["--artifact", path, "--port", "0", "--no-pallas"])
    assert served["kw"]["block"] is True
    assert served["srv"].batch_sizes == [1]  # artifact's buckets
    assert "serving artifact" in capsys.readouterr().out

    # explicitly passed flags beat the artifact's embedded settings
    serve_mod.main(["--artifact", path, "--port", "0", "--no-pallas",
                    "--batch-sizes", "1", "2", "--thres", "0.3"])
    assert served["srv"].batch_sizes == [1, 2]
    assert served["srv"].thres == 0.3

    for bad in ([], ["--artifact", path, "--ckpt", "x.ckpt"]):
        with pytest.raises(SystemExit):
            serve_mod.main(bad + (["--port", "0"] if bad else []))
