#!/usr/bin/env python
"""Weather-resilient on-chip test-suite runner (TGI_TEST_TPU=1).

The tunneled TPU aborts/hangs intermittently ("tunnel weather",
.claude/skills/verify/SKILL.md). A single long pytest process is poisoned by
the first abort: every subsequent dispatch fails with
``ABORTED: TPU backend error`` even after the chip recovers, so two round-4
full-suite attempts lost 50-75 % of their results to one mid-run outage.

This runner isolates the damage:

- each test FILE runs in its own fresh process;
- a trivial-matmul probe (subprocess, hard timeout) gates every file, and a
  file whose output shows the abort signature — or that times out — is
  retried after the probe goes green again;
- files run **cheapest/CPU-light first**, kernel-heavy Pallas files LAST, so
  an outage window still accrues maximal recorded value (round-4 lesson:
  the old alphabetical order put `test_fused_ln.py` near the front and one
  wedged kernel consumed an entire session);
- a **per-TEST watchdog** (tests/conftest.py, ``TGI_PER_TEST_TIMEOUT_S``)
  os._exit(77)s the pytest process when one test wedges a dispatch; the
  runner records the wedged test id, re-runs the file with it deselected,
  and counts it as an error — one wedged test costs ~watchdog seconds, not
  the whole file budget;
- weather retries are capped (default ``--max-retries 1`` → 2 attempts/file);
- every finished file atomically updates the state sidecar AND re-renders
  docs/TESTS_TPU.md, so the artifact is always current and ``--resume``
  continues from where a kill landed;
- a pause file (``--pause-file``, default /tmp/tpu_suite_pause) makes the
  runner idle between files while it exists, so interactive perf probes can
  borrow the single chip without two processes racing it.

Usage:
  python scripts/run_tpu_suite.py [--resume] [--files tests/test_x.py ...]
"""

import argparse
import datetime
import glob
import json
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

ABORT_SIGNATURES = (
    "ABORTED: TPU backend error",
    "FAILED_PRECONDITION: TPU backend error",
    "DEADLINE_EXCEEDED",
)

WATCHDOG_RE = re.compile(r"WATCHDOG_TIMEOUT (\S+)")
WATCHDOG_EXIT = 77
# pytest -q short-summary lines: nodeid + first line of the failure reason.
# Captured into the state sidecar / markdown so an on-chip failure is
# diagnosable after the run (the raw output is deliberately not persisted).
FAILED_RE = re.compile(r"^(?:FAILED|ERROR) (\S+?)(?: - (.*))?$", re.M)

# Cost classes for run ordering (cheapest first). Class 0 never touches jax;
# class 1 is host-logic with at most trivial device work; class 2 drives the
# CLI surface / model forward passes; class 3 is parallelism (multi-process /
# full training loops); class 4 is kernel-heavy Pallas files whose compiles
# have wedged the tunnel before — they go last so an outage mid-run still
# leaves everything else recorded. Unlisted files default to class 2.
COST_CLASS = {
    "test_tpu_suite_runner.py": 0,
    "test_config.py": 1, "test_hvo.py": 1, "test_data.py": 1,
    "test_midi.py": 1, "test_sweep.py": 1, "test_wandb_contract.py": 1,
    "test_legacy_pickle.py": 1, "test_mso_oracle.py": 1,
    "test_native_audio.py": 1, "test_features.py": 1,
    "test_edge_cases.py": 2, "test_evaluator.py": 2,
    "test_media_golden.py": 2, "test_evaluate_cli.py": 2,
    "test_export.py": 2, "test_serve.py": 2, "test_losses.py": 2,
    "test_dropout.py": 2, "test_vmap_sweep.py": 2,
    "test_train.py": 3, "test_streaming.py": 3, "test_pipeline.py": 3,
    "test_parallel.py": 3, "test_multihost.py": 3,
    "test_compute_dtype.py": 4, "test_device_synth.py": 4,
    "test_device_pipeline.py": 4, "test_mso_audio.py": 4,
    "test_torch_parity.py": 4, "test_fused_ffn.py": 4,
    "test_fused_layer.py": 4, "test_fused_decoder_layer.py": 4,
    "test_fused_ln.py": 5,  # wedged the chip 4×2400s in round 4: dead last
}


def order_key(path):
    base = os.path.basename(path)
    return (COST_CLASS.get(base, 2), base)


PROBE = (
    "import numpy as np, jax, jax.numpy as jnp;"
    "x = jnp.asarray(np.ones((128,128), np.float32));"
    "print(float(np.asarray(x @ x)[0,0]))"
)


def probe_ok(timeout=150):
    # 150 s, not 75: jax init + first dispatch through a healthy-but-slow
    # tunnel exceeds 75 s, and host CPU contention (a concurrent pytest)
    # starves the probe child — both read as false DOWNs that stall the
    # suite for entire healthy windows (round-5 log, 11:45-11:56)
    try:
        r = subprocess.run([sys.executable, "-c", PROBE], timeout=timeout,
                           capture_output=True, text=True, cwd=REPO)
        return r.returncode == 0 and "128.0" in r.stdout
    except subprocess.TimeoutExpired:
        return False


def wait_for_tpu(log, poll_s=240, max_wait_s=None):
    t0 = time.time()
    while True:
        if probe_ok():
            log(f"probe UP after {time.time() - t0:.0f}s")
            return True
        if max_wait_s is not None and time.time() - t0 > max_wait_s:
            log(f"probe still DOWN after {max_wait_s}s — giving up")
            return False
        log("probe DOWN; sleeping")
        time.sleep(poll_s)


def parse_tail(text):
    """Return (passed, failed, skipped, errors, seconds) from pytest -q output."""
    for line in reversed(text.splitlines()):
        if " in " not in line:
            continue
        # -q prints the summary bare ("11 skipped in 1.71s") — an all-skip
        # file has NO passed/failed/error token and was mis-read as
        # unparseable (= weather), burning retries on test_parallel/
        # test_pipeline whose 8-virtual-device skipif skips everything
        # on the 1-chip backend (round-5 find)
        if "=" not in line and not any(
                w in line for w in ("passed", "failed", "error", "skipped",
                                    "xfailed", "xpassed")):
            continue
        line = line.strip("= ")
        counts = {"passed": 0, "failed": 0, "skipped": 0, "error": 0,
                  "errors": 0, "deselected": 0, "warning": 0, "warnings": 0,
                  "xfailed": 0, "xpassed": 0}
        m_time = re.search(r"in ([0-9.]+)s", line)
        hit = False
        for n, word in re.findall(r"(\d+) (\w+)", line):
            if word in counts:
                counts[word] = int(n)
                hit = True
        if hit:
            return (counts["passed"], counts["failed"], counts["skipped"],
                    counts["error"] + counts["errors"],
                    float(m_time.group(1)) if m_time else 0.0)
    return None


def run_file(path, timeout, per_test_timeout, deselect=()):
    # the watchdog marker travels via a sidecar file: pytest's fd-level
    # capture swallows the child's raw fd-2 write and os._exit(77) never
    # flushes the capture tempfile back (tests/conftest.py::_watchdog_fire)
    wd_file = os.path.join(REPO, f".watchdog.{os.getpid()}.txt")
    if os.path.exists(wd_file):
        os.unlink(wd_file)
    env = dict(os.environ, TGI_TEST_TPU="1",
               TGI_PER_TEST_TIMEOUT_S=str(per_test_timeout),
               TGI_WATCHDOG_FILE=wd_file)
    cmd = [sys.executable, "-m", "pytest", path, "-q", "--no-header", "-p",
           "no:cacheprovider"]
    for nodeid in deselect:
        cmd += ["--deselect", nodeid]
    t0 = time.time()
    try:
        r = subprocess.run(cmd, timeout=timeout, capture_output=True,
                           text=True, cwd=REPO, env=env)
        out = r.stdout + r.stderr
        rc = r.returncode
    except subprocess.TimeoutExpired as e:
        out = ((e.stdout or b"").decode(errors="replace") if
               isinstance(e.stdout, bytes) else (e.stdout or ""))
        out += _read_watchdog(wd_file)
        return "timeout", out, time.time() - t0
    out += _read_watchdog(wd_file)
    if rc == WATCHDOG_EXIT or "WATCHDOG_TIMEOUT " in out:
        return "wedged", out, time.time() - t0
    if rc == 78 or "TPU_BACKEND_UNAVAILABLE" in out:
        # conftest integrity gate: the child initialized on a non-TPU
        # backend — treat as weather, never record as an on-chip result
        return "aborted", out, time.time() - t0
    aborted = any(s in out for s in ABORT_SIGNATURES)
    return ("aborted" if aborted else "done"), out, time.time() - t0


def _read_watchdog(wd_file):
    """Drain the watchdog sidecar file into the parseable output stream."""
    try:
        with open(wd_file) as f:
            content = f.read()
        os.unlink(wd_file)
        return "\n" + content
    except OSError:
        return ""


def atomic_write(path, payload):
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        f.write(payload)
    os.replace(tmp, path)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--files", nargs="*", default=None)
    p.add_argument("--max-retries", type=int, default=1,
                   help="weather retries per file (attempts = retries+1)")
    p.add_argument("--max-wedge-deselects", type=int, default=4,
                   help="per file: how many wedged tests may be deselected "
                        "before the file is given up")
    p.add_argument("--file-timeout", type=float, default=2400.0)
    p.add_argument("--per-test-timeout", type=float, default=360.0,
                   help="watchdog seconds per TEST inside pytest "
                        "(tests/conftest.py, TGI_PER_TEST_TIMEOUT_S)")
    p.add_argument("--out", default=os.path.join(REPO, "docs", "TESTS_TPU.md"))
    p.add_argument("--log", default="/tmp/tpu_suite_runner.log")
    p.add_argument("--pause-file", default="/tmp/tpu_suite_pause",
                   help="while this file exists the runner idles between "
                        "files (lets perf probes borrow the chip)")
    p.add_argument("--resume", action="store_true",
                   help="skip files already recorded in the state sidecar "
                        "(<out>.state.json) — a killed/interrupted run "
                        "continues where it left off instead of starting over")
    p.add_argument("--render-only", action="store_true",
                   help="regenerate the markdown artifact from the state "
                        "sidecar and exit (no TPU needed, state not touched)")
    args = p.parse_args(argv)

    logf = open(args.log, "a", buffering=1)

    def log(msg):
        line = f"{datetime.datetime.now():%H:%M:%S} {msg}"
        print(line, flush=True)
        logf.write(line + "\n")

    files = args.files or sorted(
        glob.glob(os.path.join(REPO, "tests", "test_*.py")))
    files = sorted((os.path.relpath(f, REPO) for f in files), key=order_key)

    # Incremental state: one mid-run tunnel death (or a wall-clock kill) must
    # not discard hours of completed files. Every finished file updates the
    # sidecar AND re-renders the markdown artifact (both atomically:
    # temp + os.replace — a kill mid-write must not corrupt the resume
    # state), so the artifact is always current; --resume picks up from the
    # sidecar.
    state_path = args.out + ".state.json"
    results = {}
    weather_events = 0
    prior_wall = 0.0
    if args.render_only and not os.path.exists(state_path):
        log(f"render-only: no state sidecar at {state_path}; refusing to "
            "fabricate an empty artifact")
        return 1
    if (args.resume or args.render_only) and os.path.exists(state_path):
        with open(state_path) as f:
            st = json.load(f)
        results = {k: {**v, "counts": tuple(v["counts"]) if v["counts"]
                       else None}
                   for k, v in st["results"].items()}
        weather_events = st.get("weather_events", 0)
        prior_wall = st.get("wall_s", 0.0)
        done = [f for f in files
                if results.get(f, {}).get("counts") is not None]
        log(f"resume: {len(done)}/{len(files)} files already recorded")
    log(f"suite start: {len(files)} files")

    t_suite = time.time()

    def totals_now():
        tot, unres = [0, 0, 0, 0], []
        for pth, r in results.items():
            if r["counts"] is None:
                unres.append(pth)
                continue
            for i in range(4):
                tot[i] += r["counts"][i]
            tot[3] += len(r.get("wedged", ()))  # wedged tests count as errors
        return tot, unres

    def flush_artifacts(write_state=True):
        tot, unres = totals_now()
        wall = prior_wall + (0.0 if args.render_only
                             else time.time() - t_suite)
        if write_state:
            atomic_write(state_path, json.dumps(
                {"results": {k: {kk: vv for kk, vv in v.items()
                                 if kk != "output"}
                             for k, v in results.items()},
                 "weather_events": weather_events, "wall_s": wall}))
        pending = [p for p in files if p not in results]
        atomic_write(args.out, render_markdown(
            results, tot, unres, weather_events, wall, pending=pending))
        return tot, unres, wall

    def exit_code(tot, unres):
        return 0 if (tot[1] == 0 and tot[3] == 0 and not unres) else 2

    if args.render_only:
        tot, unres, wall = flush_artifacts(write_state=False)
        log(f"render-only: passed={tot[0]} failed={tot[1]} skipped={tot[2]} "
            f"errors={tot[3]} across {len(results)} files -> {args.out}")
        return exit_code(tot, unres)

    if not wait_for_tpu(log):
        log("TPU never came up; exiting")
        return 1
    for path in files:
        if results.get(path, {}).get("counts") is not None:
            continue
        while os.path.exists(args.pause_file):
            log(f"paused ({args.pause_file} exists); sleeping")
            time.sleep(60)
        deselect = []
        attempt = 0
        while attempt <= args.max_retries:
            status, out, dt = run_file(path, args.file_timeout,
                                       args.per_test_timeout,
                                       deselect=deselect)
            tail = parse_tail(out)
            if status == "done" and tail is not None:
                results[path] = {"attempts": attempt + 1, "time_s": dt,
                                 "counts": tail, "wedged": list(deselect),
                                 "failed": [[fid, (msg or "")[:200]]
                                            for fid, msg in
                                            FAILED_RE.findall(out)],
                                 "output": out}
                log(f"{path}: p{tail[0]} f{tail[1]} s{tail[2]} e{tail[3]} "
                    f"wedged={len(deselect)} in {dt:.0f}s "
                    f"(attempt {attempt + 1})")
                flush_artifacts()
                break
            if status == "wedged":
                wedged_ids = WATCHDOG_RE.findall(out)
                new = [w for w in wedged_ids if w not in deselect]
                deselect += new or [f"{path}::UNKNOWN"]
                log(f"{path}: per-test watchdog fired on "
                    f"{new or ['<unparsed>']} after {dt:.0f}s — "
                    f"deselecting and re-running "
                    f"({len(deselect)}/{args.max_wedge_deselects})")
                weather_events += 1  # a wedge usually takes the tunnel down
                if len(deselect) > args.max_wedge_deselects:
                    results[path] = {"attempts": attempt + 1, "time_s": dt,
                                     "counts": None,
                                     "wedged": list(deselect), "output": out}
                    log(f"{path}: too many wedged tests; giving up")
                    flush_artifacts()
                    break
                if not wait_for_tpu(log):
                    results[path] = {"attempts": attempt + 1, "time_s": dt,
                                     "counts": None,
                                     "wedged": list(deselect), "output": out}
                    flush_artifacts()
                    break
                continue  # wedge re-runs don't consume a weather attempt
            attempt += 1
            weather_events += 1
            log(f"{path}: {status} after {dt:.0f}s (attempt {attempt}) — "
                "waiting for TPU")
            if attempt > args.max_retries:
                results[path] = {"attempts": attempt, "time_s": dt,
                                 "counts": None, "wedged": list(deselect),
                                 "output": out}
                log(f"{path}: exhausted retries")
                flush_artifacts()
                break
            if not wait_for_tpu(log):
                results[path] = {"attempts": attempt, "time_s": dt,
                                 "counts": None, "wedged": list(deselect),
                                 "output": out}
                flush_artifacts()
                break

    total, unresolved, wall = flush_artifacts()
    log(f"suite done: passed={total[0]} failed={total[1]} skipped={total[2]} "
        f"errors={total[3]} unresolved_files={len(unresolved)} "
        f"weather_events={weather_events} wall={wall:.0f}s")
    log(f"wrote {args.out}")
    return exit_code(total, unresolved)


def render_markdown(results, total, unresolved, weather_events, wall,
                    pending=None):
    now = datetime.datetime.now().strftime("%Y-%m-%d %H:%M UTC")
    lines = [
        "# On-chip test-suite run (`TGI_TEST_TPU=1`)",
        "",
        f"Recorded {now} on the real tunneled TPU (v5 lite) via "
        "`scripts/run_tpu_suite.py` — each test file in a fresh process "
        "(cheapest first, kernel-heavy last) with a health probe + retry "
        "between files and a per-test watchdog "
        "(one tunnel abort poisons a process permanently; two monolithic "
        "attempts lost most of their results to mid-run weather before this "
        "runner existed).",
        "",
        f"**Totals: {total[0]} passed, {total[1]} failed, {total[2]} skipped, "
        f"{total[3]} errors** across {len(results)} files; "
        f"{weather_events} weather events absorbed; wall {wall / 60:.0f} min.",
        "",
        "| file | passed | failed | skipped | errors | attempts | time (s) |",
        "|---|---|---|---|---|---|---|",
    ]
    wedged_all = []
    for path in sorted(results):
        r = results[path]
        c = r["counts"]
        wedged_all += [(path, w) for w in r.get("wedged", ())]
        if c is None:
            lines.append(f"| {path} | — | — | — | — | {r['attempts']} | "
                         f"{r['time_s']:.0f} | ")
            continue
        lines.append(f"| {path} | {c[0]} | {c[1]} | {c[2]} | {c[3]} | "
                     f"{r['attempts']} | {r['time_s']:.0f} |")
    failed_all = [(p, f) for p in sorted(results)
                  for f in results[p].get("failed", ())]
    if failed_all:
        lines += ["", "Failed tests (nodeid — first line of the reason):", ""]
        lines += [f"- `{f[0]}` — {f[1]}" if len(f) > 1 and f[1] else
                  f"- `{f[0]}`" for _, f in failed_all]
    if wedged_all:
        lines += ["", "Wedged tests (per-test watchdog fired; counted as "
                      "errors in the totals):", ""]
        lines += [f"- {w}" for _, w in wedged_all]
    if unresolved:
        lines += ["", "Unresolved files (TPU never recovered within the "
                      "retry budget):", ""]
        lines += [f"- {p}" for p in unresolved]
    if pending:
        lines += ["", f"**Run in progress** — {len(pending)} files not yet "
                      "attempted (on-chip files run ~10-40 min each through "
                      "the tunnel; resume with `scripts/run_tpu_suite.py "
                      "--resume` to continue from the state sidecar):", ""]
        lines += [f"- {p}" for p in pending]
    lines.append("")
    return "\n".join(lines)


if __name__ == "__main__":
    sys.exit(main())
