"""Native C++ mixer + SF2 parser/writer roundtrip."""

import numpy as np
import pytest

from transformergrooveinfilling_tpu.audio import synth
from transformergrooveinfilling_tpu.audio.drumkit import default_kit
from transformergrooveinfilling_tpu.hvo.mapping import VOICE_TO_MIDI_NOTE

native = pytest.importorskip(
    "transformergrooveinfilling_tpu.audio.native_binding")


def test_native_builds():
    lib = native.get_lib()
    assert lib is not None


def test_native_mix_matches_numpy(rng):
    table = default_kit(44100)
    n = 44100
    voices = rng.integers(0, 9, 20).astype(np.int32)
    onsets = rng.integers(0, n - 1, 20).astype(np.int64)
    vels = rng.random(20).astype(np.float32)

    buf_native = np.zeros(n, np.float32)
    native.mix_events_native(buf_native, table, voices, onsets, vels)

    buf_numpy = np.zeros(n, np.float32)
    synth._mix_events_numpy(buf_numpy, table, voices, onsets, vels)

    np.testing.assert_allclose(buf_native, buf_numpy, atol=1e-6)
    assert np.abs(buf_native).max() > 0


def test_native_mix_bounds():
    """Events at/after buffer end and invalid voices must not crash."""
    table = default_kit(44100)
    buf = np.zeros(1000, np.float32)
    voices = np.asarray([0, 99, -1, 1], np.int32)
    onsets = np.asarray([900, 0, 0, 999], np.int64)
    vels = np.ones(4, np.float32)
    native.mix_events_native(buf, table, voices, onsets, vels)
    assert np.isfinite(buf).all()


def test_resample_linear():
    t = np.linspace(0, 1, 1000).astype(np.float32)
    out = native.resample_linear(t, 2.0)
    assert abs(len(out) - 499) <= 1
    np.testing.assert_allclose(out[:400], t[: 800 : 2][:400], atol=1e-5)


def test_sf2_write_parse_roundtrip(tmp_path):
    from transformergrooveinfilling_tpu.audio.sf2 import (
        kit_from_sf2, parse_sf2, write_minimal_sf2,
    )

    sr = 44100
    kit = default_kit(sr)
    samples = {key: kit[v] for v, key in enumerate(VOICE_TO_MIDI_NOTE)}
    path = str(tmp_path / "testkit.sf2")
    write_minimal_sf2(path, samples, sr=sr)

    sf = parse_sf2(path)
    assert len(sf["shdr"]) == len(samples)
    assert sf["phdr"][0][2] == 128  # percussion bank

    table = kit_from_sf2(path, sr)
    assert len(table) == 9
    # same rate + root key == target → samples round-trip (16-bit quantized)
    for v in range(9):
        n = min(len(table[v]), len(kit[v]) - 1, 2000)
        np.testing.assert_allclose(table[v][:n], kit[v][:n], atol=2e-3)


def test_synthesis_with_sf2(tmp_path):
    from transformergrooveinfilling_tpu.audio.sf2 import write_minimal_sf2

    sr = 44100
    kit = default_kit(sr)
    samples = {key: kit[v] for v, key in enumerate(VOICE_TO_MIDI_NOTE)}
    path = str(tmp_path / "kit.sf2")
    write_minimal_sf2(path, samples, sr=sr)

    hvo = np.zeros((32, 27), np.float32)
    hvo[0, 0] = 1
    hvo[0, 9] = 1.0
    y_sf2 = synth.synthesize_hvo(hvo, qpm=120, sf_path=path)
    y_kit = synth.synthesize_hvo(hvo, qpm=120, sf_path=None)
    n = min(len(y_sf2), len(y_kit), 5000)
    np.testing.assert_allclose(y_sf2[:n], y_kit[:n], atol=5e-3)


def test_synthesize_hvo_list_bit_matches_per_item(rng, tmp_path):
    """One batched mixer call per media epoch must be bit-identical to the
    per-item ``synthesize_hvo`` path it replaced (eval/evaluator.py::get_audios),
    across varying tempos and mixed soundfonts."""
    from transformergrooveinfilling_tpu.audio.sf2 import write_minimal_sf2
    from transformergrooveinfilling_tpu.hvo.mapping import VOICE_TO_MIDI_NOTE

    sr = 44100
    kit = default_kit(sr)
    sf_path = str(tmp_path / "kit.sf2")
    write_minimal_sf2(
        sf_path, {key: kit[v] for v, key in enumerate(VOICE_TO_MIDI_NOTE)},
        sr=sr)

    m = 7
    hvos = (rng.random((m, 32, 27)) > 0.85).astype(np.float32)
    hvos[..., 9:18] *= rng.random((m, 32, 9)).astype(np.float32)
    hvos[..., 18:27] = (rng.random((m, 32, 9)).astype(np.float32) - 0.5) * \
        hvos[..., :9]
    # one loud item exercises the per-item peak normalization
    hvos[2, :, 9:18] *= 40.0
    qpms = np.asarray([60.0, 90.0, 120.0, 140.0, 75.0, 120.0, 200.0])
    sfs = [None, sf_path, None, sf_path, None, None, sf_path]

    waves = synth.synthesize_hvo_list(hvos, qpms, sfs, sr=sr)
    assert len(waves) == m
    for i in range(m):
        ref = synth.synthesize_hvo(hvos[i], qpm=qpms[i], sf_path=sfs[i], sr=sr)
        assert waves[i].shape == ref.shape, i
        np.testing.assert_array_equal(waves[i], ref, err_msg=f"item {i}")


def test_synthesize_hvo_list_empty():
    assert synth.synthesize_hvo_list(
        np.zeros((0, 32, 27), np.float32), np.zeros(0), []) == []


def test_sf2_truncation_sweep_never_crashes_ungracefully(tmp_path):
    """Every truncation of a valid .sf2 must either parse or raise a
    ValueError (SF2Error) — never IndexError/struct.error/ZeroDivisionError
    (same contract as the SMF parser fuzz suite in test_midi.py)."""
    from transformergrooveinfilling_tpu.audio.sf2 import (
        kit_from_sf2, write_minimal_sf2)
    from transformergrooveinfilling_tpu.hvo.mapping import VOICE_TO_MIDI_NOTE

    sr = 44100
    kit = default_kit(sr)
    base = str(tmp_path / "kit.sf2")
    write_minimal_sf2(
        base, {key: kit[v][:2000] for v, key in enumerate(VOICE_TO_MIDI_NOTE)},
        sr=sr)
    blob = open(base, "rb").read()
    for frac in (0.01, 0.1, 0.3, 0.5, 0.7, 0.9, 0.97, 0.999):
        p = str(tmp_path / f"trunc_{frac}.sf2")
        with open(p, "wb") as f:
            f.write(blob[: int(len(blob) * frac)])
        try:
            kit_from_sf2(p, sr)
        except ValueError:
            pass  # SF2Error subclasses ValueError


def test_sf2_byte_fuzz_never_crashes_ungracefully(tmp_path):
    """Random byte corruption: parse or clean ValueError, nothing else."""
    from transformergrooveinfilling_tpu.audio.sf2 import (
        kit_from_sf2, write_minimal_sf2)
    from transformergrooveinfilling_tpu.hvo.mapping import VOICE_TO_MIDI_NOTE

    sr = 44100
    kit = default_kit(sr)
    base = str(tmp_path / "kit.sf2")
    write_minimal_sf2(
        base, {key: kit[v][:2000] for v, key in enumerate(VOICE_TO_MIDI_NOTE)},
        sr=sr)
    blob = bytearray(open(base, "rb").read())
    rng = np.random.default_rng(11)
    for trial in range(40):
        mutated = bytearray(blob)
        for _ in range(rng.integers(1, 12)):
            mutated[rng.integers(0, len(mutated))] = rng.integers(0, 256)
        p = str(tmp_path / f"fuzz_{trial}.sf2")
        with open(p, "wb") as f:
            f.write(bytes(mutated))
        try:
            kit_from_sf2(p, sr)
        except ValueError:
            pass


def test_sf2_inconsistent_tables_raise_sf2error(tmp_path, monkeypatch):
    """Bag/sample indices pointing past their tables (valid RIFF framing,
    corrupt content) must surface as SF2Error, not IndexError."""
    import transformergrooveinfilling_tpu.audio.sf2 as sf2mod
    from transformergrooveinfilling_tpu.hvo.mapping import VOICE_TO_MIDI_NOTE

    sr = 44100
    kit = default_kit(sr)
    base = str(tmp_path / "kit.sf2")
    sf2mod.write_minimal_sf2(
        base, {key: kit[v][:2000] for v, key in enumerate(VOICE_TO_MIDI_NOTE)},
        sr=sr)
    real = sf2mod.parse_sf2(base)

    def corrupt_parse(path):
        sf = dict(real)
        # zones still reference sample IDs, but the sample table is gone →
        # sf["shdr"][sample_id] would IndexError without the hardening
        sf["shdr"] = []
        return sf

    monkeypatch.setattr(sf2mod, "parse_sf2", corrupt_parse)
    with pytest.raises(sf2mod.SF2Error, match="malformed SoundFont"):
        sf2mod.kit_from_sf2(str(tmp_path / "corrupt.sf2"), sr)


def test_synthesize_hvo_list_scalar_qpm_single_item():
    hvo = np.zeros((1, 32, 27), np.float32)
    hvo[0, 0, 0] = 1.0
    hvo[0, 0, 9] = 0.8
    waves = synth.synthesize_hvo_list(hvo, 120.0, [None])
    np.testing.assert_array_equal(waves[0], synth.synthesize_hvo(hvo[0]))
