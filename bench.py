#!/usr/bin/env python
"""Benchmark: training throughput (HVO seqs/sec/chip) on the flagship config.

Measures the compiled whole-epoch training step of the InfillingRandom
production model (d_model 256, ff 512, 6 layers — configs/
InfillingRandom_training.yaml) on whatever accelerator JAX exposes (the real TPU
chip under the driver), then compares against a live torch-CPU baseline of the
identical architecture + loss + SGD step — the reference stack's compute path on
this host (the reference publishes no numbers of its own; BASELINE.md protocol).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

# the accelerator bench runs in a CHILD process under this timeout: the
# tunneled TPU backend can become unresponsive (observed: even a trivial op
# blocks forever with ~0 CPU), and a hung bench records nothing for the
# round. Generous: first compile is 20-40 s and the measured phase ~15 s.
CHILD_TIMEOUT_S = 900.0

BATCH = 512
N_SAMPLES = 4096
EPOCHS_PER_CALL = 20
T, E_SRC, E_TGT = 32, 16, 27
BASELINE_STEPS = 4
BASELINE_BATCH = 128  # torch-CPU baseline batch (throughput-per-seq comparable)
SECONDS_BUDGET = 15.0
MAX_CALLS = 8


def _flagship_yaml() -> dict:
    """The flagship hyperparameters, read from the config file itself so the
    benchmark can't drift from configs/InfillingRandom_training.yaml."""
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "configs", "InfillingRandom_training.yaml")
    try:
        import yaml

        with open(path) as f:
            return yaml.safe_load(f) or {}
    except Exception:
        return {}


_Y = _flagship_yaml()
D_MODEL = int(_Y.get("d_model", 256))
N_HEADS = int(_Y.get("n_heads", 2))
DIM_FF = int(_Y.get("dim_feedforward", 512))
N_LAYERS = int(_Y.get("num_encoder_decoder_layers", 6))
DROPOUT = float(_Y.get("dropout", 0.30))
LEARNING_RATE = float(_Y.get("learning_rate", 0.089))
HIT_LOSS_PENALTY = float(_Y.get("hit_loss_penalty", 0.73))


def bench_jax() -> float:
    import jax

    # rbg PRNG: ~2x step time at this model size (dropout-mask generation with
    # threefry was ~half the step); statistically fine for dropout masks
    jax.config.update("jax_default_prng_impl", "unsafe_rbg")
    import jax.numpy as jnp

    from transformergrooveinfilling_tpu.models import build_model
    from transformergrooveinfilling_tpu.models.transformer import (
        GrooveTransformerConfig,
    )
    from transformergrooveinfilling_tpu.train.loop import (
        create_train_state, make_epoch_fn, make_optimizer,
    )

    # CPU fallback (no accelerator): shrink the workload so the bench still
    # completes — the resulting number is a CPU number, not the TPU headline
    on_cpu = jax.default_backend() == "cpu"
    n_samples = 512 if on_cpu else N_SAMPLES
    batch = 128 if on_cpu else BATCH
    epochs_per_call = 2 if on_cpu else EPOCHS_PER_CALL
    max_calls = 2 if on_cpu else MAX_CALLS

    from transformergrooveinfilling_tpu.train.config import (
        resolve_fused_layer,
    )

    config = GrooveTransformerConfig(
        d_model=D_MODEL, n_heads=N_HEADS, dim_feedforward=DIM_FF,
        dropout=DROPOUT, num_encoder_layers=N_LAYERS, max_len=T,
        embedding_size_src=E_SRC, embedding_size_tgt=E_TGT,
        compute_dtype=jnp.bfloat16,
        # the production auto policy (docs/PERF.md round 4: +20 % whole-step
        # at this config from the whole-encoder-layer fused kernel)
        fused_layer=resolve_fused_layer(None, D_MODEL, N_HEADS, DIM_FF),
    )
    model = build_model(config)
    tx = make_optimizer("sgd", LEARNING_RATE)
    state = create_train_state(model, config, tx, jax.random.PRNGKey(0))

    rng = np.random.default_rng(0)
    inputs = jnp.asarray(rng.standard_normal((n_samples, T, E_SRC)), jnp.float32)
    h = (rng.random((n_samples, T, 9)) < 0.3).astype(np.float32)
    outputs = jnp.asarray(
        np.concatenate([h, h * rng.random(h.shape),
                        h * (rng.random(h.shape) - 0.5)], axis=2), jnp.float32)

    # EPOCHS_PER_CALL epochs run as one XLA program: measures the device, not
    # the host↔device dispatch link
    epoch_fn = make_epoch_fn(model, tx, HIT_LOSS_PENALTY, batch, n_samples,
                             donate=True, n_epochs=epochs_per_call)
    key = jax.random.PRNGKey(1)

    # warmup/compile (fetch the value: on the tunneled dev backend
    # block_until_ready can return before device work completes)
    state, m = epoch_fn(state, inputs, outputs, key)
    float(np.asarray(m["loss"]))

    # best-call throughput: each call is epochs_per_call epochs ending in a
    # forced loss fetch; best-of is robust to transient host/tunnel noise
    calls = 0
    best_dt = float("inf")
    t_start = time.perf_counter()
    while time.perf_counter() - t_start < SECONDS_BUDGET or calls < 2:
        key, k = jax.random.split(key)
        t0 = time.perf_counter()
        state, m = epoch_fn(state, inputs, outputs, k)
        final_loss = float(np.asarray(m["loss"]))  # forces full completion
        best_dt = min(best_dt, time.perf_counter() - t0)
        calls += 1
        if calls >= max_calls:
            break
    assert np.isfinite(final_loss)
    return n_samples * epochs_per_call / best_dt


def bench_torch_baseline() -> float:
    """Reference-stack proxy: identical torch model/loss/SGD on this host."""
    try:
        import torch
        from torch import nn
    except Exception:
        return float("nan")

    torch.manual_seed(0)
    torch.set_num_threads(max(torch.get_num_threads(), 1))

    class Model(nn.Module):
        def __init__(self):
            super().__init__()
            self.embed = nn.Linear(E_SRC, D_MODEL)
            # sinusoidal PE + post-embed dropout: the same input layer the
            # JAX model runs, so the baseline does identical work per step
            pos = np.arange(T)[:, None]
            div = np.exp(np.arange(0, D_MODEL, 2) * (-np.log(1e4) / D_MODEL))
            pe = np.zeros((1, T, D_MODEL), np.float32)
            pe[0, :, 0::2] = np.sin(pos * div)
            pe[0, :, 1::2] = np.cos((pos * div)[:, : D_MODEL // 2])
            self.register_buffer("pe", torch.from_numpy(pe))
            self.drop = nn.Dropout(DROPOUT)
            layer = nn.TransformerEncoderLayer(
                D_MODEL, N_HEADS, DIM_FF, dropout=DROPOUT, activation="relu",
                batch_first=True, norm_first=False)
            self.enc = nn.TransformerEncoder(layer, N_LAYERS,
                                             norm=nn.LayerNorm(D_MODEL))
            self.out = nn.Linear(D_MODEL, E_TGT)

        def forward(self, x):
            h = self.drop(torch.relu(self.embed(x)) + self.pe)
            y = self.out(self.enc(h))
            return torch.split(y, E_TGT // 3, dim=2)

    model = Model()
    opt = torch.optim.SGD(model.parameters(), lr=LEARNING_RATE)
    bce = nn.BCEWithLogitsLoss(reduction="none")
    mse = nn.MSELoss(reduction="none")

    rng = np.random.default_rng(0)
    x = torch.from_numpy(
        rng.standard_normal((BASELINE_BATCH, T, E_SRC)).astype(np.float32))
    h = (rng.random((BASELINE_BATCH, T, 9)) < 0.3).astype(np.float32)
    y = torch.from_numpy(np.concatenate(
        [h, h * rng.random(h.shape), h * (rng.random(h.shape) - 0.5)],
        axis=2).astype(np.float32))
    y_h, y_v, y_o = torch.split(y, 9, dim=2)
    penalty = torch.where(y_h == 1, 1.0, HIT_LOSS_PENALTY)

    def step():
        opt.zero_grad()
        p_h, p_v, p_o = model(x)
        loss = ((bce(p_h, y_h) * penalty).sum(2).mean()
                + (mse(torch.sigmoid(p_v), y_v) * penalty).sum(2).mean()
                + (mse(torch.tanh(p_o) * 0.5, y_o) * penalty).sum(2).mean())
        loss.backward()
        opt.step()

    step()  # warmup
    # best single-step time: robust to transient host load on a 1-core box
    best = float("inf")
    for _ in range(BASELINE_STEPS):
        t0 = time.perf_counter()
        step()
        best = min(best, time.perf_counter() - t0)
    return BASELINE_BATCH / best


def _child_main():
    """--jax-child: run the accelerator bench in this (child) process and
    report machine-readably on stdout. Kept out of the parent so a hung
    device RPC can be killed by the parent's timeout."""
    import jax

    value = bench_jax()
    print(f"JAXRESULT {jax.default_backend()} {value!r}", flush=True)


def _run_jax_subprocess(force_cpu: bool):
    env = dict(os.environ)
    if force_cpu:
        env["TGI_PLATFORM"] = "cpu"
        env["JAX_PLATFORMS"] = "cpu"
    proc = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--jax-child"],
        env=env, timeout=CHILD_TIMEOUT_S, capture_output=True, text=True)
    for line in reversed(proc.stdout.splitlines()):
        if line.startswith("JAXRESULT "):
            _, platform, raw = line.split(" ", 2)
            return platform, float(raw)
    raise RuntimeError(
        f"bench child exited {proc.returncode} without a result:\n"
        f"{proc.stdout[-2000:]}\n{proc.stderr[-2000:]}")


def _accelerator_responsive() -> bool:
    """Cheap child-process probe: one tiny matmul with a forced value fetch.
    A dead tunnel blocks it forever; the timeout (generous vs ~20-40 s
    backend init) is the detector."""
    probe = ("import jax, numpy as np\n"
             "x = jax.numpy.ones((8, 8))\n"
             "print('PROBE_OK', float(np.asarray((x @ x).sum())))\n")
    try:
        proc = subprocess.run([sys.executable, "-c", probe], timeout=150,
                              capture_output=True, text=True)
        return "PROBE_OK" in proc.stdout
    except subprocess.TimeoutExpired:
        return False


RECORD_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "bench_tpu_record.json")


def _read_record():
    try:
        with open(RECORD_PATH) as f:
            return json.load(f)
    except Exception:
        return None


def _write_record(platform: str, value: float):
    try:
        rev = subprocess.run(["git", "rev-parse", "--short", "HEAD"],
                             capture_output=True, text=True,
                             cwd=os.path.dirname(RECORD_PATH)).stdout.strip()
    except Exception:
        rev = ""
    with open(RECORD_PATH, "w") as f:
        json.dump({"value": round(value, 1), "platform": platform,
                   "unit": "HVO seqs/sec/chip", "commit": rev,
                   "measured_at": time.strftime("%Y-%m-%dT%H:%M:%SZ",
                                                time.gmtime())}, f)
        f.write("\n")


def main():
    if "--jax-child" in sys.argv:
        return _child_main()
    # only TGI_PLATFORM counts as a CPU request: this image exports
    # JAX_PLATFORMS=axon globally and its sitecustomize overrides the env
    # var anyway, so JAX_PLATFORMS says nothing about the user's intent
    cpu_requested = os.environ.get("TGI_PLATFORM") == "cpu"
    def _wait_for_accelerator(attempts, sleep_s):
        # tunnel weather outages run 20-40 min on bad days (round-5 log);
        # the round headline is worth waiting out most of one before
        # forfeiting to the CPU fallback. Worst-case dead-tunnel wait:
        # attempts × (150 s probe timeout + sleep_s) ≈ 27 min at (6, 120).
        for attempt in range(attempts):
            if _accelerator_responsive():
                return True
            print(f"bench: accelerator probe timed out "
                  f"(attempt {attempt + 1}/{attempts})", file=sys.stderr)
            if attempt < attempts - 1:
                time.sleep(sleep_s)
        return False

    try:
        if not cpu_requested and not _wait_for_accelerator(6, 120):
            raise RuntimeError("accelerator probe timed out 6x")
        try:
            platform, value = _run_jax_subprocess(force_cpu=False)
        except (subprocess.TimeoutExpired, RuntimeError) as e:
            # the child can start healthy and die to mid-run weather; one
            # re-probe + retry before the fallback
            print(f"bench: accelerator leg failed once ({e}); re-probing "
                  "for a retry", file=sys.stderr)
            if cpu_requested or not _wait_for_accelerator(4, 120):
                raise
            platform, value = _run_jax_subprocess(force_cpu=False)
    except (subprocess.TimeoutExpired, RuntimeError) as e:
        # print the full error (a RuntimeError carries the child's captured
        # stdout/stderr tails): a real child crash must stay diagnosable, not
        # vanish into the CPU fallback
        print(f"bench: accelerator run failed ({type(e).__name__}): {e}\n"
              "falling back to CPU — the value below is NOT the TPU headline",
              file=sys.stderr)
        platform, value = _run_jax_subprocess(force_cpu=True)
        platform = f"{platform}-fallback-accelerator-unresponsive"
    baseline = bench_torch_baseline()
    vs = value / baseline if baseline and np.isfinite(baseline) else None
    out = {
        "metric": "train_throughput_infilling_random",
        "value": round(value, 1),
        "unit": "HVO seqs/sec/chip",
        "vs_baseline": round(vs, 2) if vs else None,
        # vs_baseline compares against the SAME architecture+loss+SGD step in
        # torch on this host's single CPU core (the reference publishes no
        # numbers and no GPU exists here; BASELINE.md protocol) — it is NOT a
        # reference-GPU comparison
        "baseline": "torch-cpu-1core",
        "platform": platform,
    }
    if platform.startswith("cpu"):
        # not the TPU headline: carry the last hardware-measured result (and
        # its provenance) so a dead-tunnel fallback run stays interpretable
        rec = _read_record()
        if rec:
            out["last_accelerator"] = rec
    else:
        _write_record(platform, value)
    print(json.dumps(out))


if __name__ == "__main__":
    sys.exit(main())
