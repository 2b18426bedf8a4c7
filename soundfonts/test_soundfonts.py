#!/usr/bin/env python
"""Soundfont sanity filter (reference soundfonts/test_soundfonts.py equivalent).

Synthesizes a few random training loops through each .sf2 in a directory and
keeps the file only if the rendered audio contains more than one detected onset
— filtering silent/broken soundfonts before dataset construction. Detection
uses the framework's own MSO onset-strength pipeline (the reference used
librosa's onset_detect). Deletion is opt-in (--delete); default just reports.

Usage: python soundfonts/test_soundfonts.py --sf-dir soundfonts/my_kits [--delete]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from transformergrooveinfilling_tpu.data.synthetic import synthetic_gmd_sequences
from transformergrooveinfilling_tpu.ops.mso import MSOParams, mso_from_audio


def count_onsets(y: np.ndarray, qpm: float, thresh: float = 0.5) -> int:
    """Grid steps whose summed multiband onset strength clears a relative
    threshold."""
    mso = mso_from_audio(y, n_steps=32, qpm=qpm)
    strength = mso.sum(axis=1)
    peak = strength.max()
    if peak <= 1e-6:
        return 0
    return int((strength > thresh * peak).sum())


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--sf-dir", required=True)
    parser.add_argument("--n-items", type=int, default=3)
    parser.add_argument("--min-onsets", type=int, default=2)
    parser.add_argument("--delete", action="store_true",
                        help="delete failing soundfonts (default: report only)")
    args = parser.parse_args(argv)

    items = synthetic_gmd_sequences(args.n_items, seed=0)
    kept, dropped = [], []
    for fname in sorted(os.listdir(args.sf_dir)):
        if not fname.endswith(".sf2"):
            continue
        path = os.path.join(args.sf_dir, fname)
        try:
            onsets = min(
                count_onsets(seq.synthesize(sf_path=path),
                             seq.tempos[0].qpm)
                for seq in items
            )
        except Exception as e:
            print(f"  {fname}: unreadable ({e})")
            onsets = 0
        if onsets >= args.min_onsets:
            kept.append(fname)
            print(f"  {fname}: OK ({onsets} onsets)")
        else:
            dropped.append(fname)
            print(f"  {fname}: FAIL ({onsets} onsets)")
            if args.delete:
                os.remove(path)
    print(f"kept {len(kept)}, {'deleted' if args.delete else 'flagged'} "
          f"{len(dropped)}")
    return 0 if kept else 1


if __name__ == "__main__":
    sys.exit(main())
