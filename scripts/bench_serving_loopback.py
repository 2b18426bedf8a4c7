#!/usr/bin/env python
"""Loopback HTTP serving latency for the exported flagship artifact.

Closes BASELINE.md's <20 ms p50 serving target with a measurement instead of
an inference (VERDICT r4 weak #6): the previous evidence was 0.044 ms
device-side + ~29 ms tunnel-bound HTTP p50, from which "any co-located
deployment is far under target" was *deduced*. Here the full HTTP path —
socket, JSON, bucket pad, jit dispatch, JSON reply — runs against the
exported StableHLO artifact (export.py) on THIS host over 127.0.0.1, no
tunnel anywhere, exactly the co-located-CPU deployment the deduction assumed.

Writes docs/serving_loopback.json and prints a summary.
"""

import json
import os
import sys
import threading
import time
import urllib.request

os.environ.setdefault("TGI_PLATFORM", "cpu")  # before package import

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np  # noqa: E402


def _percentiles(lat_ms):
    return {
        "p50_ms": round(float(np.percentile(lat_ms, 50)), 3),
        "p90_ms": round(float(np.percentile(lat_ms, 90)), 3),
        "p99_ms": round(float(np.percentile(lat_ms, 99)), 3),
        "mean_ms": round(float(np.mean(lat_ms)), 3),
        "n": len(lat_ms),
    }


def main():
    import jax

    from __graft_entry__ import _flagship_config
    from transformergrooveinfilling_tpu.export import export_infill
    from transformergrooveinfilling_tpu.models import build_model
    from transformergrooveinfilling_tpu.serve import (
        InfillServer, latency_benchmark)

    config = _flagship_config()
    model = build_model(config)
    params = model.init(jax.random.PRNGKey(0),
                        np.zeros((1, config.max_len,
                                  config.embedding_size_src), np.float32),
                        deterministic=True)["params"]
    artifact = "/tmp/flagship_loopback.tgix"
    export_infill(params, config, artifact, batch_sizes=(1, 8, 32))

    results = {
        "host": "loopback 127.0.0.1 (no tunnel)",
        "backend": jax.default_backend(),
        "model": f"d{config.d_model}/ff{config.dim_feedforward}/"
                 f"{config.num_encoder_layers}L flagship "
                 "(configs/InfillingRandom_training.yaml)",
        "artifact": "export.py StableHLO artifact, served via "
                    "InfillServer.from_exported",
    }

    # (a) in-process path (no HTTP): the floor the HTTP stack sits on
    server = InfillServer.from_exported(artifact, use_pallas=False)
    results["in_process_b1"] = latency_benchmark(server, n_requests=200)

    httpd = server.serve_http(port=0, block=False)
    port = httpd.server_address[1]
    url = f"http://127.0.0.1:{port}/infill"
    x1 = np.zeros((config.max_len, config.embedding_size_src),
                  np.float32).tolist()
    body = json.dumps({"input": x1}).encode()

    def one_request():
        t0 = time.perf_counter()
        r = urllib.request.urlopen(url, body)
        r.read()
        return (time.perf_counter() - t0) * 1000.0

    one_request()  # prime
    # (b) sequential B=1 over HTTP — the headline row
    results["http_b1_sequential"] = _percentiles(
        [one_request() for _ in range(300)])

    # (c) 8 concurrent clients, coalesced into batched device calls
    httpd.shutdown()
    server_c = InfillServer.from_exported(artifact, use_pallas=False,
                                          coalesce=True)
    httpd = server_c.serve_http(port=0, block=False)
    url = f"http://127.0.0.1:{httpd.server_address[1]}/infill"
    lat_lock = threading.Lock()
    lats = []

    def client(n):
        mine = []
        for _ in range(n):
            t0 = time.perf_counter()
            r = urllib.request.urlopen(url, body)
            r.read()
            mine.append((time.perf_counter() - t0) * 1000.0)
        with lat_lock:
            lats.extend(mine)

    client(3)  # prime coalescer
    lats.clear()
    threads = [threading.Thread(target=client, args=(40,)) for _ in range(8)]
    t0 = time.perf_counter()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0
    agg = _percentiles(lats)
    agg["aggregate_req_per_s"] = round(len(lats) / wall, 1)
    results["http_8clients_coalesced"] = agg
    httpd.shutdown()

    results["target_p50_ms"] = 20.0
    results["target_met"] = (
        results["http_b1_sequential"]["p50_ms"] < 20.0)
    out = os.path.join(REPO, "docs", "serving_loopback.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results, indent=1))
    print(f"wrote {out}")
    return 0 if results["target_met"] else 1


if __name__ == "__main__":
    sys.exit(main())
