"""MIDI ↔ HVO: SMF writer/parser roundtrip, grid quantization, GMD tree."""

import csv
import os

import numpy as np
import pytest

from transformergrooveinfilling_tpu.data.midi import (
    gmd_to_processed_tree,
    hvo_to_midi,
    midi_to_hvo_sequences,
    parse_midi,
)
from transformergrooveinfilling_tpu.data.synthetic import synthetic_gmd_sequences
from transformergrooveinfilling_tpu.hvo import N_VOICES
from transformergrooveinfilling_tpu.hvo.sequence import Metadata


def test_roundtrip_single_loop(rng):
    seqs = synthetic_gmd_sequences(1, seed=4)
    seq = seqs[0]
    seq.hvo[:, 2 * N_VOICES:] = np.round(seq.hvo[:, 2 * N_VOICES:] * 8) / 8
    # a negative offset on step 0 has no MIDI representation (negative tick)
    seq.hvo[0, 2 * N_VOICES:] = np.maximum(seq.hvo[0, 2 * N_VOICES:], 0)

    blob = hvo_to_midi(seq)
    back = midi_to_hvo_sequences(blob, metadata=seq.metadata)
    assert len(back) == 1
    b = back[0]
    np.testing.assert_allclose(b.hits, seq.hits)
    # velocity quantized to 127 levels
    np.testing.assert_allclose(b.velocities, seq.velocities, atol=1 / 127)
    # offsets quantized by tick resolution (480 ticks/qn → 120/step)
    np.testing.assert_allclose(b.offsets, seq.offsets, atol=1 / 100)
    assert abs(b.tempos[0].qpm - seq.tempos[0].qpm) < 0.5


def test_parse_midi_meta(rng):
    seq = synthetic_gmd_sequences(1, seed=5)[0]
    mid = parse_midi(hvo_to_midi(seq))
    assert mid["division"] == 480
    assert len(mid["tempi"]) == 1
    assert mid["time_signatures"][0][1:] == (4, 4)
    assert len(mid["notes"]) == int(seq.hits.sum())


def test_long_midi_splits_into_loops(rng):
    a, b = synthetic_gmd_sequences(2, seed=6)
    # concatenate two loops into one 64-step sequence
    seq = a.copy()
    seq.hvo = np.concatenate([a.hvo, b.hvo], axis=0)
    blob = hvo_to_midi(seq)
    loops = midi_to_hvo_sequences(blob)
    assert len(loops) == 2
    np.testing.assert_allclose(loops[0].hits, a.hits)
    np.testing.assert_allclose(loops[1].hits, b.hits)


def test_unmapped_notes_ignored():
    import struct
    from transformergrooveinfilling_tpu.data.midi import _varlen

    # craft a track with one unmapped note (note 1) and one kick (36)
    track = (_varlen(0) + bytes([0x99, 1, 100])
             + _varlen(0) + bytes([0x99, 36, 100])
             + _varlen(0) + b"\xff\x2f\x00")
    blob = (b"MThd" + struct.pack(">IHHH", 6, 0, 1, 480)
            + b"MTrk" + struct.pack(">I", len(track)) + track)
    seqs = midi_to_hvo_sequences(blob)
    assert len(seqs) == 1
    assert seqs[0].hits.sum() == 1
    assert seqs[0].hits[0, 0] == 1


def test_gmd_tree_conversion(tmp_path):
    # build a fake GMD archive from synthetic loops
    gmd = tmp_path / "gmd"
    os.makedirs(gmd / "drummer1" / "session1")
    rows = []
    for i, seq in enumerate(synthetic_gmd_sequences(6, seed=9)):
        rel = f"drummer1/session1/{i}.mid"
        hvo_to_midi(seq, str(gmd / rel))
        rows.append({
            "drummer": "drummer1", "session": "session1", "id": str(i),
            "style": seq.metadata.style_primary, "bpm": seq.metadata.bpm,
            "beat_type": "beat", "time_signature": "4-4",
            "midi_filename": rel, "audio_filename": "",
            "duration": "", "split": "train" if i < 4 else "test",
        })
    with open(gmd / "info.csv", "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(rows[0]))
        w.writeheader()
        w.writerows(rows)

    out = tmp_path / "processed"
    counts = gmd_to_processed_tree(str(gmd), str(out))
    assert counts["train"] >= 4 and counts["test"] >= 2
    assert (out / "GrooveMIDI_processed_train" / "hvo_sequence_data.obj").exists()
    assert (out / "GrooveMIDI_processed_train" / "metadata.csv").exists()

    # the subsetter reads the produced tree
    from transformergrooveinfilling_tpu.data.subsetter import GrooveMidiSubsetter

    tags, subsets = GrooveMidiSubsetter(
        pickle_source_path=str(out), subset="GrooveMIDI_processed_train",
    ).create_subsets()
    assert len(subsets[0]) == counts["train"]
    assert subsets[0][0].metadata.drummer == "drummer1"


def test_process_dataset_entry_from_gmd_tree(tmp_path, monkeypatch):
    """End to end: MIDI archive → processed tree → process_dataset CLI →
    dataset pickles a training run can load."""
    import csv as _csv
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import process_dataset as pd_cli

    gmd = tmp_path / "gmd"
    os.makedirs(gmd / "d" / "s")
    rows = []
    for i, seq in enumerate(synthetic_gmd_sequences(8, seed=77)):
        rel = f"d/s/{i}.mid"
        hvo_to_midi(seq, str(gmd / rel))
        rows.append({"drummer": "d", "session": "s", "id": str(i),
                     "style": seq.metadata.style_primary,
                     "bpm": seq.metadata.bpm, "beat_type": "beat",
                     "time_signature": "4-4", "midi_filename": rel,
                     "audio_filename": "", "duration": "",
                     "split": "train"})
    with open(gmd / "info.csv", "w", newline="") as f:
        w = _csv.DictWriter(f, fieldnames=list(rows[0]))
        w.writeheader()
        w.writerows(rows)
    processed = tmp_path / "processed"
    gmd_to_processed_tree(str(gmd), str(processed))

    monkeypatch.chdir(tmp_path)
    pd_cli.main(["--experiments", "InfillingClosedHH_Symbolic",
                 "--splits", "train", "--source", str(processed)])
    out_dir = "datasets/InfillingClosedHH_Symbolic/0.1.1/train"
    assert os.path.isdir(out_dir)

    from transformergrooveinfilling_tpu.data import load_processed_dataset

    ds = load_processed_dataset(out_dir, exp="InfillingClosedHH_Symbolic")
    assert len(ds) > 0
    assert ds.processed_inputs.shape[1:] == (32, 27)
