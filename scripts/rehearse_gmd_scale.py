#!/usr/bin/env python
"""North-star rehearsal at REAL GMD scale (VERDICT r3 directive #3).

Everything measured before round 4 streamed <=10,240 augmented items (2,560
base loops); the real Groove MIDI Dataset is ~20k loops -> 80k+ augmented
items. This script runs the FULL production pipeline, via the same CLIs a
user runs, at that scale:

  1. synthesize a ~20k-loop GMD-style MIDI archive (info.csv + .mid files);
  2. ``gmd_to_processed_tree`` -> the processed pickle layout;
  3. ``process_dataset --source <tree>`` -> InfillingRandom dataset pickles
     (train split at full scale; test/validation at reference scale);
  4. ``process_evaluator`` -> evaluator pickles;
  5. ``train.py --config configs/InfillingRandom_training.yaml
     --streaming host --regen_partial K`` on the real chip, end to end.

Records stage walls, streaming swap cadence (generation build time), device
array footprint, and the training e2e wall into docs/gmd_scale_rehearsal.json
(summarized in docs/PERF.md). Overwrites the gitignored
datasets/InfillingRandom + evaluator pickles — regenerate the small ones with
``python process_dataset.py --experiments InfillingRandom`` afterwards (tests
do it automatically via conftest.ensure_dataset_artifacts).

Usage: python scripts/rehearse_gmd_scale.py [--loops 20480] [--fanout 4]
       [--partial 8] [--skip-archive]  (archive reuse across attempts)
"""

import argparse
import csv
import json
import os
import shutil
import subprocess
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def build_archive(workdir: str, loops: int) -> dict:
    """Stage 1: synthetic GMD-style archive. Train split at full scale,
    test/validation at the reference's ~110-loop scale."""
    from transformergrooveinfilling_tpu.data.midi import hvo_to_midi
    from transformergrooveinfilling_tpu.data.synthetic import (
        synthetic_gmd_sequences,
    )

    gmd = os.path.join(workdir, "gmd")
    shutil.rmtree(gmd, ignore_errors=True)
    os.makedirs(os.path.join(gmd, "d", "s"))
    rows = []
    t0 = time.perf_counter()
    splits = [("train", loops, 100), ("test", 110, 200),
              ("validation", 110, 300)]
    for split, n, seed in splits:
        for i, seq in enumerate(synthetic_gmd_sequences(n, seed=seed)):
            rel = f"d/s/{split}_{i}.mid"
            hvo_to_midi(seq, os.path.join(gmd, rel))
            rows.append({
                "drummer": "d", "session": "s", "id": f"{split}_{i}",
                "style": seq.metadata.style_primary, "bpm": seq.metadata.bpm,
                "beat_type": "beat", "time_signature": "4-4",
                "midi_filename": rel, "audio_filename": "", "duration": "",
                "split": split})
    with open(os.path.join(gmd, "info.csv"), "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(rows[0]))
        w.writeheader()
        w.writerows(rows)
    wall = time.perf_counter() - t0
    return {"stage": "archive", "files": len(rows), "wall_s": round(wall, 1),
            "files_per_s": round(len(rows) / wall, 0)}


def convert_tree(workdir: str) -> dict:
    from transformergrooveinfilling_tpu.data.midi import gmd_to_processed_tree

    out = os.path.join(workdir, "processed")
    shutil.rmtree(out, ignore_errors=True)
    t0 = time.perf_counter()
    counts = gmd_to_processed_tree(os.path.join(workdir, "gmd"), out)
    wall = time.perf_counter() - t0
    total = sum(counts.values())
    return {"stage": "gmd_to_processed_tree", "counts": counts,
            "wall_s": round(wall, 1), "loops_per_s": round(total / wall, 0)}


def run_cli(cmd, env=None) -> float:
    t0 = time.perf_counter()
    e = dict(os.environ)
    e.update(env or {})
    subprocess.run(cmd, cwd=REPO, env=e, check=True)
    return time.perf_counter() - t0


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--loops", type=int, default=20480)
    p.add_argument("--fanout", type=int, default=4)
    p.add_argument("--partial", type=int, default=8)
    p.add_argument("--workdir", default="/tmp/gmd_scale")
    p.add_argument("--skip-archive", action="store_true")
    p.add_argument("--skip-dataset", action="store_true")
    p.add_argument("--skip-train", action="store_true",
                   help="host-side stages only (CPU smoke)")
    args = p.parse_args(argv)

    os.makedirs(args.workdir, exist_ok=True)
    # stage results persist in the workdir so the host-side stages (CPU) and
    # the train stage (needs the chip) can run as separate invocations
    stages_path = os.path.join(args.workdir, "stages.json")
    stages = []
    if os.path.exists(stages_path):
        with open(stages_path) as f:
            stages = json.load(f)
    report = {"loops": args.loops, "fanout": args.fanout,
              "aug_items": args.loops * args.fanout,
              "partial": args.partial, "stages": stages}

    def record(r):
        print(r, flush=True)
        stages[:] = [s for s in stages if s["stage"] != r["stage"]]
        stages.append(r)
        with open(stages_path, "w") as f:
            json.dump(stages, f, indent=1)

    if not args.skip_archive:
        record(build_archive(args.workdir, args.loops))
        record(convert_tree(args.workdir))

    if not args.skip_dataset:
        # full-scale dataset pickles through the production CLI; the
        # rehearsal caps augmentation at --fanout (the real GMD protocol's
        # item count), overriding the config default via --params-json
        pj = os.path.join(args.workdir, "params.json")
        with open(pj, "w") as f:
            json.dump({"InfillingRandom": {"max_aug_items": args.fanout}}, f)
        wall = run_cli([sys.executable, "process_dataset.py",
                        "--experiments", "InfillingRandom",
                        "--source", os.path.join(args.workdir, "processed"),
                        "--params-json", pj],
                       env={"TGI_PLATFORM": "cpu"})
        record({"stage": "process_dataset", "wall_s": round(wall, 1)})
        wall = run_cli([sys.executable, "process_evaluator.py",
                        "--experiments", "InfillingRandom",
                        "--source", os.path.join(args.workdir, "processed"),
                        "--splits", "train", "validation"],
                       env={"TGI_PLATFORM": "cpu"})
        record({"stage": "process_evaluator", "wall_s": round(wall, 1)})

    if args.skip_train:
        out = os.path.join(REPO, "docs", "gmd_scale_rehearsal.json")
        print(json.dumps(report, indent=1))
        return 0

    # stage 5: the production training CLI, streaming fresh augmentations
    t0 = time.perf_counter()
    run_cli([sys.executable, "train.py",
             "--config", "configs/InfillingRandom_training.yaml",
             "--wandb", "False", "--dump_eval", "False",
             "--streaming", "host",
             "--aug_per_item", str(args.fanout),
             "--regen_partial", str(args.partial),
             "--epoch_block", "25"])
    wall = time.perf_counter() - t0
    record({"stage": "train_e2e", "wall_s": round(wall, 1)})

    # newest run dir → block-gap / swap stats from metrics.jsonl
    runs = os.path.join(REPO, "runs", "InfillingRandom")
    if os.path.isdir(runs):
        newest = max((os.path.join(runs, d) for d in os.listdir(runs)),
                     key=os.path.getmtime)
        mpath = os.path.join(newest, "metrics.jsonl")
        if os.path.exists(mpath):
            ts = []
            with open(mpath) as f:
                for line in f:
                    try:
                        rec = json.loads(line)
                    except json.JSONDecodeError:
                        continue
                    if "_timestamp" in rec:
                        ts.append(rec["_timestamp"])
            if len(ts) > 2:
                gaps = np.diff(sorted(ts))
                report["block_gaps_s"] = {
                    "mean": round(float(gaps.mean()), 2),
                    "p90": round(float(np.percentile(gaps, 90)), 2),
                    "max": round(float(gaps.max()), 2),
                    "span": round(float(ts[-1] - ts[0]), 1)}
            report["run_dir"] = newest

    # device footprint of the streamed arrays (inputs f32 16-band MSO +
    # outputs f32 27-wide HVO)
    n = args.loops * args.fanout
    report["device_arrays_gib"] = round(
        n * 32 * (16 + 27) * 4 / 1024**3, 3)

    out = os.path.join(REPO, "docs", "gmd_scale_rehearsal.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=1)
    print(f"wrote {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
