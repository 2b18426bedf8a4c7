"""Low-latency infill serving.

The north-star serving target (BASELINE.md): < 20 ms p50 per 2-bar infill on one
TPU chip. Design:

- predict is AOT-compiled per batch-size bucket at server start (no first-hit
  compile stall); requests route to the smallest bucket ≥ n and are padded —
  static shapes, zero recompiles in steady state.
- inputs transfer as one host→device copy; outputs come back as a single
  device→host copy of three stacked head tensors.
- the Pallas fused attention kernel is enabled on the serving model
  (config.use_pallas_attention).

``InfillServer.serve_http`` exposes a stdlib ThreadingHTTPServer JSON endpoint
(POST /infill with {"input": [[...]], "qpm": optional}) — the "streaming infill
server" configuration of BASELINE.json without any web-framework dependency.
"""

from __future__ import annotations

import dataclasses
import json
import threading
import time
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .models import build_model
from .models.transformer import GrooveTransformerConfig


@dataclasses.dataclass
class ServeStats:
    """Latency accounting shared across ThreadingHTTPServer handler threads;
    all access is lock-guarded (record's halving `del` would otherwise race
    /healthz percentile reads)."""

    count: int = 0
    latencies_ms: list = dataclasses.field(default_factory=list)
    _lock: threading.Lock = dataclasses.field(
        default_factory=threading.Lock, repr=False)

    def record(self, ms: float):
        with self._lock:
            self.count += 1
            self.latencies_ms.append(ms)
            if len(self.latencies_ms) > 10000:
                del self.latencies_ms[: len(self.latencies_ms) // 2]

    def percentile(self, p: float) -> float:
        with self._lock:
            if not self.latencies_ms:
                return float("nan")
            return float(np.percentile(self.latencies_ms, p))


class _Coalescer:
    """Dynamic request batching: concurrent callers' inputs merge into one
    compiled call per dispatch window. Under N concurrent clients the device
    sees ~N-sized batches instead of N serialized size-1 calls, so tail
    latency stays one-batch-deep instead of N-deep."""

    def __init__(self, server: "InfillServer", max_wait_ms: float = 2.0):
        import queue

        self._server = server
        self._queue: "queue.Queue" = queue.Queue()
        self._max_wait = max_wait_ms / 1000.0
        self._thread = threading.Thread(target=self._loop, daemon=True,
                                        name="infill-coalescer")
        self._thread.start()

    def submit(self, x: np.ndarray) -> np.ndarray:
        done = threading.Event()
        holder: dict = {}
        self._queue.put((x, done, holder))
        done.wait()
        if "err" in holder:
            raise holder["err"]
        return holder["out"]

    def _loop(self):
        import queue

        while True:
            first = self._queue.get()
            batch = [first]
            count = first[0].shape[0]
            cap = self._server.batch_sizes[-1]
            deadline = time.perf_counter() + self._max_wait
            while count < cap:
                remaining = deadline - time.perf_counter()
                if remaining <= 0:
                    break
                try:
                    nxt = self._queue.get(timeout=remaining)
                except queue.Empty:
                    break
                batch.append(nxt)
                count += nxt[0].shape[0]
            try:
                out = self._server._predict_batched(
                    np.concatenate([b[0] for b in batch], axis=0))
                i = 0
                for x, done, holder in batch:
                    holder["out"] = out[i : i + x.shape[0]]
                    i += x.shape[0]
                    done.set()
            except Exception as e:  # propagate to every still-waiting caller
                for _x, done, holder in batch:
                    # never clobber a result already handed out: a failure
                    # partway through distribution must not turn an already-
                    # released success into a spurious error
                    if "out" not in holder:
                        holder["err"] = e
                    done.set()


class InfillServer:
    def __init__(self, params, config: GrooveTransformerConfig,
                 batch_sizes: Sequence[int] = (1, 8, 32),
                 use_thres: bool = True, thres: float = 0.5,
                 use_pallas: bool | None = None,
                 coalesce: bool = False, coalesce_wait_ms: float = 2.0):
        if use_pallas is None:
            # the fused kernel is TPU Pallas (pltpu VMEM); anything else
            # (cpu, gpu) takes the XLA einsum path
            use_pallas = jax.default_backend() == "tpu"
        self.config = dataclasses.replace(config, use_pallas_attention=use_pallas)
        self.model = build_model(self.config)
        self.params = jax.device_put(params)
        self.batch_sizes = sorted(batch_sizes)
        self.use_thres = use_thres
        self.thres = thres
        self.stats = ServeStats()
        self._coalescer = (_Coalescer(self, coalesce_wait_ms) if coalesce
                           else None)

        def _predict(params, x):
            h_logits, v, o = self.model.apply({"params": params}, x,
                                              deterministic=True)
            h = jax.nn.sigmoid(h_logits)
            if use_thres:
                h = (h > thres).astype(jnp.float32)
            return jnp.concatenate([h, v, o], axis=-1)

        self._compiled = {}
        e = self.config.embedding_size_src
        for b in self.batch_sizes:
            fn = jax.jit(_predict)
            shape = jax.ShapeDtypeStruct((b, self.config.max_len, e), jnp.float32)
            self._compiled[b] = fn.lower(self.params, shape).compile()
        # warmup execution (allocator, tunnels)
        for b in self.batch_sizes:
            x = jnp.zeros((b, self.config.max_len, e), jnp.float32)
            np.asarray(self._compiled[b](self.params, x))

    @classmethod
    def from_exported(cls, path: str, **kwargs) -> "InfillServer":
        """Build a full server (coalescing, HTTP, stats) from an artifact
        written by ``export.export_infill``. Rebuilds the in-package model
        from the artifact's embedded config+params — use
        ``export.load_infill`` instead when the model code must stay out of
        the deployment (it runs the serialized StableHLO directly)."""
        from .export import load_infill
        from .train.checkpoint import config_from_json_dict

        loaded = load_infill(path)
        config = config_from_json_dict(loaded.config_dict)
        kwargs.setdefault("batch_sizes", tuple(loaded.batch_sizes))
        kwargs.setdefault("use_thres", loaded.meta["use_thres"])
        kwargs.setdefault("thres", loaded.meta["thres"])
        return cls(loaded.params, config, **kwargs)

    def _bucket(self, n: int) -> int:
        for b in self.batch_sizes:
            if b >= n:
                return b
        return self.batch_sizes[-1]

    def _predict_batched(self, x: np.ndarray) -> np.ndarray:
        """Validated ``(N, T, E)`` → ``(N, T, 27)`` through the compiled
        per-bucket programs (pad to bucket, chunk if over the largest)."""
        n = x.shape[0]
        pending = []  # dispatch every chunk first; materialize after
        i = 0
        while i < n:
            b = self._bucket(n - i)
            chunk = x[i : i + b]
            if chunk.shape[0] < b:
                chunk = np.pad(chunk, ((0, b - chunk.shape[0]), (0, 0), (0, 0)))
            pending.append(
                (self._compiled[b](self.params, jnp.asarray(chunk)),
                 min(b, n - i)))
            i += b
        return np.concatenate(
            [np.asarray(y)[:keep] for y, keep in pending], axis=0)

    def infill(self, inputs: np.ndarray) -> np.ndarray:
        """``(N, T, E_src)`` (or a single ``(T, E_src)``) → ``(N, T, 27)``."""
        t0 = time.perf_counter()
        x = np.asarray(inputs, np.float32)
        single = x.ndim == 2
        if single:
            x = x[None]
        expected = (self.config.max_len, self.config.embedding_size_src)
        if x.ndim != 3 or x.shape[1:] != expected:
            raise ValueError(
                f"input must be (T={expected[0]}, E={expected[1]}) or "
                f"(N, {expected[0]}, {expected[1]}); got {np.asarray(inputs).shape}")
        if self._coalescer is not None:
            out = self._coalescer.submit(x)
        else:
            out = self._predict_batched(x)
        self.stats.record((time.perf_counter() - t0) * 1000.0)
        return out[0] if single else out

    def infill_from_hvo(self, partial_hvo, qpm: float = 120.0,
                        sf_path=None) -> np.ndarray:
        """Infill from a partial HVO grid.

        For audio-modality models (16-wide input) this runs the full direct-
        audio front end server-side: synthesize the partial loop (host C++
        mixer), compute its MSO (device DSP), then infill. Symbolic models
        take the grid directly.
        """
        x = np.asarray(partial_hvo, np.float32)
        single = x.ndim == 2
        if single:
            x = x[None]
        if self.config.embedding_size_src == x.shape[-1]:
            inputs = x  # symbolic model: the grid is the input
        else:
            from .ops.mso import MSOParams, mso_batch_from_hvo

            inputs = mso_batch_from_hvo(
                x, [sf_path] * x.shape[0], np.full((x.shape[0],), qpm),
                params=MSOParams())
        out = self.infill(inputs)
        return out[0] if single else out

    # -- HTTP endpoint ---------------------------------------------------------

    def serve_http(self, host: str = "127.0.0.1", port: int = 8327,
                   block: bool = True):
        from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

        server_self = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet
                pass

            def do_GET(self):
                if self.path == "/healthz":
                    p50 = server_self.stats.percentile(50)
                    p99 = server_self.stats.percentile(99)
                    body = json.dumps({
                        "ok": True,
                        "count": server_self.stats.count,
                        # null, not NaN: bare NaN is invalid JSON and breaks
                        # strict parsers (e.g. JS JSON.parse) on a fresh server
                        "p50_ms": p50 if np.isfinite(p50) else None,
                        "p99_ms": p99 if np.isfinite(p99) else None,
                    }).encode()
                    self.send_response(200)
                    self.send_header("Content-Type", "application/json")
                    self.send_header("Content-Length", str(len(body)))
                    self.end_headers()
                    self.wfile.write(body)
                else:
                    self.send_response(404)
                    self.end_headers()

            def do_POST(self):
                if self.path != "/infill":
                    self.send_response(404)
                    self.end_headers()
                    return
                try:
                    n = int(self.headers.get("Content-Length", 0))
                    payload = json.loads(self.rfile.read(n))
                    if "hvo_input" in payload:
                        # partial HVO grid: server runs the synth+MSO front end
                        # for audio models (or passes through for symbolic)
                        out = server_self.infill_from_hvo(
                            np.asarray(payload["hvo_input"], np.float32),
                            qpm=float(payload.get("qpm", 120.0)))
                    elif "input" in payload:
                        x = np.asarray(payload["input"], np.float32)
                        out = server_self.infill(x)
                    else:
                        raise ValueError(
                            'request body needs an "input" (model-space) or '
                            '"hvo_input" (partial HVO grid) field')
                    reply = {"hvo": out.tolist()}
                    if payload.get("format") == "midi":
                        # also return the infilled loop as a base64 SMF
                        import base64

                        from .hvo import HVOSequence
                        from .hvo.sequence import Tempo
                        from .data.midi import hvo_to_midi

                        seq = HVOSequence(
                            hvo=out if out.ndim == 2 else out[0],
                            tempos=[Tempo(qpm=float(
                                payload.get("qpm", 120.0)))])
                        reply["midi_base64"] = base64.b64encode(
                            hvo_to_midi(seq)).decode()
                    body = json.dumps(reply).encode()
                    self.send_response(200)
                except Exception as e:  # bad input → 400 with reason
                    body = json.dumps({"error": str(e)}).encode()
                    self.send_response(400)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

        class Server(ThreadingHTTPServer):
            # burst-tolerant accept backlog: coalescing releases whole
            # batches of clients at once, which reconnect simultaneously —
            # the stdlib default backlog of 5 resets the overflow
            request_queue_size = 128
            daemon_threads = True

        httpd = Server((host, port), Handler)
        if block:
            httpd.serve_forever()
            return httpd
        thread = threading.Thread(target=httpd.serve_forever, daemon=True)
        thread.start()
        return httpd


def latency_benchmark(server: InfillServer, n_requests: int = 100,
                      batch: int = 1, seed: int = 0) -> dict:
    """p50/p99 single-request latency through the full infill path."""
    rng = np.random.default_rng(seed)
    e = server.config.embedding_size_src
    xs = rng.standard_normal(
        (n_requests, batch, server.config.max_len, e)).astype(np.float32)
    server.infill(xs[0])  # prime
    lat = []
    for i in range(n_requests):
        t0 = time.perf_counter()
        server.infill(xs[i])
        lat.append((time.perf_counter() - t0) * 1000.0)
    return {
        "p50_ms": float(np.percentile(lat, 50)),
        "p90_ms": float(np.percentile(lat, 90)),
        "p99_ms": float(np.percentile(lat, 99)),
        "mean_ms": float(np.mean(lat)),
    }


class MultiTaskServer:
    """Serve every infilling subtask from one process (BASELINE.json config #5:
    batched multi-task serving).

    Routes by experiment name to per-task compiled servers; one shared HTTP
    endpoint (POST /infill with {"experiment": ..., "input": ...}; GET /healthz
    aggregates per-task latency stats). Each task's weights stay resident on
    the chip — at groove-model sizes all five subtasks fit trivially.
    """

    def __init__(self, bundles: dict, batch_sizes=(1, 8, 32),
                 use_pallas: bool | None = None, coalesce: bool = False,
                 coalesce_wait_ms: float = 2.0):
        """``bundles``: {experiment_name: (params, GrooveTransformerConfig)}."""
        self.servers = {
            name: InfillServer(params, config, batch_sizes=batch_sizes,
                               use_pallas=use_pallas, coalesce=coalesce,
                               coalesce_wait_ms=coalesce_wait_ms)
            for name, (params, config) in bundles.items()
        }

    def infill(self, experiment: str, inputs):
        if experiment not in self.servers:
            raise KeyError(
                f"unknown experiment {experiment!r}; serving "
                f"{sorted(self.servers)}")
        return self.servers[experiment].infill(inputs)

    def stats(self) -> dict:
        return {
            name: {"count": srv.stats.count,
                   "p50_ms": srv.stats.percentile(50),
                   "p99_ms": srv.stats.percentile(99)}
            for name, srv in self.servers.items()
        }

    def serve_http(self, host: str = "127.0.0.1", port: int = 8328,
                   block: bool = True):
        from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

        outer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):
                pass

            def _reply(self, code, payload):
                body = json.dumps(payload).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):
                if self.path == "/healthz":
                    self._reply(200, {"ok": True, "tasks": outer.stats()})
                else:
                    self.send_response(404)
                    self.end_headers()

            def do_POST(self):
                if self.path != "/infill":
                    self.send_response(404)
                    self.end_headers()
                    return
                try:
                    n = int(self.headers.get("Content-Length", 0))
                    payload = json.loads(self.rfile.read(n))
                    for field in ("experiment", "input"):
                        if field not in payload:
                            raise ValueError(
                                f'request body needs an "{field}" field')
                    out = outer.infill(payload["experiment"],
                                       np.asarray(payload["input"], np.float32))
                    self._reply(200, {"hvo": out.tolist()})
                except Exception as e:
                    self._reply(400, {"error": str(e)})

        class Server(ThreadingHTTPServer):
            # burst-tolerant accept backlog: coalescing releases whole
            # batches of clients at once, which reconnect simultaneously —
            # the stdlib default backlog of 5 resets the overflow
            request_queue_size = 128
            daemon_threads = True

        httpd = Server((host, port), Handler)
        if block:
            httpd.serve_forever()
            return httpd
        threading.Thread(target=httpd.serve_forever, daemon=True).start()
        return httpd


def main(argv=None):
    """Serve a trained checkpoint over HTTP.

    Usage: python -m transformergrooveinfilling_tpu.serve \\
               --ckpt <file-or-dir> [--port 8327] [--batch-sizes 1 8 32]
    Native ``.ckpt`` files carry their model config; for legacy ``.Model``
    files pass the architecture flags explicitly.
    """
    import argparse

    from .train import checkpoint as ckpt

    p = argparse.ArgumentParser()
    p.add_argument("--ckpt",
                   help=".ckpt/.Model file, or a directory (newest epoch wins)")
    p.add_argument("--artifact",
                   help="serve an export.py artifact (.tgix) instead of a "
                        "checkpoint — config/params/buckets/threshold come "
                        "from it unless --batch-sizes/--thres override")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8327)
    # None defaults: with --artifact, unset flags defer to the artifact's
    # embedded buckets/threshold; explicitly passed values always win
    p.add_argument("--batch-sizes", type=int, nargs="*", default=None)
    p.add_argument("--thres", type=float, default=None)
    p.add_argument("--no-pallas", action="store_true")
    p.add_argument("--coalesce", action="store_true",
                   help="dynamic-batch concurrent requests into one device "
                        "call per dispatch window")
    # legacy-.Model architecture flags
    p.add_argument("--d_model", type=int, default=32)
    p.add_argument("--n_heads", type=int, default=4)
    p.add_argument("--dim_feedforward", type=int, default=16)
    p.add_argument("--num_encoder_layers", type=int, default=6)
    p.add_argument("--embedding_size_src", type=int, default=16)
    args = p.parse_args(argv)
    if bool(args.ckpt) == bool(args.artifact):
        p.error("exactly one of --ckpt / --artifact is required")

    if args.artifact:
        kw = dict(use_pallas=False if args.no_pallas else None,
                  coalesce=args.coalesce)
        if args.batch_sizes is not None:
            kw["batch_sizes"] = args.batch_sizes
        if args.thres is not None:
            kw["thres"] = args.thres
        server = InfillServer.from_exported(args.artifact, **kw)
        print(f"serving artifact {args.artifact} "
              f"(buckets {server.batch_sizes}) "
              f"on http://{args.host}:{args.port}/infill")
        return server.serve_http(host=args.host, port=args.port, block=True)

    legacy_config = GrooveTransformerConfig(
        d_model=args.d_model, n_heads=args.n_heads,
        dim_feedforward=args.dim_feedforward,
        num_encoder_layers=args.num_encoder_layers,
        embedding_size_src=args.embedding_size_src)
    params, config, _ep, _loss = ckpt.load_params_and_config(
        args.ckpt, legacy_config=legacy_config)
    path = args.ckpt

    server = InfillServer(
        params, config,
        batch_sizes=args.batch_sizes if args.batch_sizes is not None
        else (1, 8, 32),
        thres=args.thres if args.thres is not None else 0.5,
        use_pallas=False if args.no_pallas else None,
        coalesce=args.coalesce)
    print(f"serving {path} ({config.d_model}d/{config.num_encoder_layers}L) "
          f"on http://{args.host}:{args.port}/infill")
    server.serve_http(host=args.host, port=args.port, block=True)


if __name__ == "__main__":
    main()
