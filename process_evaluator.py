#!/usr/bin/env python
"""Offline evaluator preprocessing (reference process_evaluator.py equivalent).

Builds an :class:`InfillingEvaluator` per experiment × split — GT style subsets
re-processed through the experiment's dataset pipeline — and pickles it under
``datasets/preprocessed_evaluators/InfillingEvaluator_<version>/`` where
configs/paths.yaml expects it.
"""

import argparse
import os

from transformergrooveinfilling_tpu.data import load_processed_dataset
from transformergrooveinfilling_tpu.data.experiments import EXPERIMENTS
from transformergrooveinfilling_tpu.eval.evaluator import InfillingEvaluator
from process_dataset import corpus_for_split


def build_evaluator(exp: str, split: str, dataset_path: str,
                    source: str | None = None,
                    n_samples_to_use: int = 1024,
                    n_samples_to_synthesize: int = 20,
                    n_synthetic: int | None = None) -> str:
    dataset = load_processed_dataset(dataset_path, exp=exp)
    if source is None:
        # default to the corpus the dataset itself was built from (recorded in
        # its subset_info) — a mismatched GT corpus would silently score the
        # model against sequences training never saw
        source = dataset.subset_info.get("pickle_source_path") or "synthetic"
    sequences = corpus_for_split(source, split, n_synthetic)
    pred_horizontal = exp not in ("InfillingRandom", "InfillingRandomLow")

    evaluator = InfillingEvaluator(
        pickle_source_path=dataset.subset_info["pickle_source_path"],
        set_subfolder=dataset.subset_info["subset"],
        hvo_pickle_filename=dataset.subset_info["hvo_pickle_filename"],
        max_hvo_shape=(32, 27),
        n_samples_to_use=n_samples_to_use,
        n_samples_to_synthesize_visualize_per_subset=n_samples_to_synthesize,
        _identifier=split.capitalize() + "_Set",
        disable_tqdm=False,
        analyze_heatmap=True,
        analyze_global_features=False,
        dataset=dataset,
        horizontal=pred_horizontal,
        sequences=sequences,
    )
    return evaluator.save_as_pickle(
        save_evaluator_path="datasets/preprocessed_evaluators")


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--experiments", nargs="*", default=list(EXPERIMENTS))
    p.add_argument("--splits", nargs="*",
                   default=["test", "train", "validation"])
    p.add_argument("--source", default=None,
                   help="GT corpus; default = the one the dataset was built "
                   "from (its recorded subset_info)")
    p.add_argument("--testing", action="store_true")
    p.add_argument("--n-synthetic", type=int, default=None)
    p.add_argument("--paths", default="configs/paths.yaml")
    args = p.parse_args(argv)

    import yaml
    with open(args.paths) as f:
        paths = yaml.safe_load(f)

    n_use = 10 if args.testing else 1024
    n_synth = 5 if args.testing else 20

    for exp in args.experiments:
        exp_key = exp + "_testing" if args.testing else exp
        if exp_key not in paths:
            print(f"skipping {exp_key}: not in {args.paths}")
            continue
        print(f"--- {exp_key} ---")
        for split in args.splits:
            ds_path = paths[exp_key]["datasets"].get(split)
            if not ds_path or not os.path.isdir(ds_path):
                print(f"  {split}: dataset pickle missing at {ds_path}, skip")
                continue
            out = build_evaluator(
                exp, split, ds_path, args.source,
                n_samples_to_use=n_use, n_samples_to_synthesize=n_synth,
                n_synthetic=(args.n_synthetic or (24 if args.testing else None)))
            print(f"  {split}: -> {out}")


if __name__ == "__main__":
    main()
