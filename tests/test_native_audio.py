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


# ---- SF2 generator-model fidelity (round 4: velocity layers, attenuation,
# loops, volume envelope — reference renders through full fluidsynth 2.2.6,
# /root/reference/environment.yaml; dataset sf_path kwarg dataset.py:94) ----


def _tone(freq, dur, sr=44100, amp=0.8):
    t = np.arange(int(dur * sr)) / sr
    return (amp * np.sin(2 * np.pi * freq * t)).astype(np.float32)


def test_sf2_velocity_split_layers(tmp_path):
    """gen 44 (velRange): a velocity-split kit must select different samples
    per velocity — soft hits play the soft layer, hard hits the hard one."""
    from transformergrooveinfilling_tpu.audio.sf2 import (
        kit_from_sf2, write_minimal_sf2)

    sr = 44100
    soft = _tone(200.0, 0.05, sr)
    hard = _tone(900.0, 0.05, sr)
    kick_key = VOICE_TO_MIDI_NOTE[0]
    path = str(tmp_path / "velsplit.sf2")
    write_minimal_sf2(path, {
        kick_key: [
            {"sample": soft, "vel_lo": 0, "vel_hi": 63},
            {"sample": hard, "vel_lo": 64, "vel_hi": 127},
        ],
    }, sr=sr)
    kit = kit_from_sf2(path, sr)
    lo = kit.samples[kit.lut[0, 30]]
    hi = kit.samples[kit.lut[0, 100]]
    assert kit.lut[0, 30] != kit.lut[0, 100]
    # layer content: same uniform kit normalization, different tones
    np.testing.assert_allclose(lo[:2000], 0.9 / 0.8 * soft[:2000], atol=2e-3)
    np.testing.assert_allclose(hi[:2000], 0.9 / 0.8 * hard[:2000], atol=2e-3)
    # boundary velocities land on their side of the split
    assert kit.lut[0, 63] == kit.lut[0, 0]
    assert kit.lut[0, 64] == kit.lut[0, 127]


def test_sf2_velocity_split_drives_synthesis(tmp_path):
    """End to end through synthesize_hvo: a soft and a hard hit of the same
    voice must render different layers (not one layer velocity-scaled)."""
    from transformergrooveinfilling_tpu.audio.sf2 import write_minimal_sf2

    sr = 44100
    soft = _tone(200.0, 0.05, sr)
    hard = _tone(900.0, 0.05, sr)
    kick_key = VOICE_TO_MIDI_NOTE[0]
    path = str(tmp_path / "velsplit2.sf2")
    write_minimal_sf2(path, {
        kick_key: [
            {"sample": soft, "vel_lo": 0, "vel_hi": 63},
            {"sample": hard, "vel_lo": 64, "vel_hi": 127},
        ],
    }, sr=sr)

    def render(vel):
        hvo = np.zeros((32, 27), np.float32)
        hvo[0, 0] = 1.0
        hvo[0, 9] = vel
        return synth.synthesize_hvo(hvo, qpm=120, sf_path=path, sr=sr)

    y_soft = render(0.3)   # MIDI 38 → soft layer
    y_hard = render(1.0)   # MIDI 127 → hard layer
    n = 2000
    scale = 0.9 / 0.8
    # amplitude follows the SF2 default modulator's (v/127)² law
    # (audio/synth.py::velocity_gain), not linear velocity
    gain_soft = (38 / 127.0) ** 2
    np.testing.assert_allclose(y_soft[:n], gain_soft * scale * soft[:n],
                               atol=3e-3)
    np.testing.assert_allclose(y_hard[:n], scale * hard[:n], atol=3e-3)


def test_sf2_initial_attenuation(tmp_path):
    """gen 48: per-zone attenuation in centibels survives kit-wide
    normalization (10 cB = 0.5 dB... exactly 10^(-cB/200))."""
    from transformergrooveinfilling_tpu.audio.sf2 import (
        kit_from_sf2, write_minimal_sf2)

    sr = 44100
    tone = _tone(300.0, 0.05, sr)
    k0, k1 = VOICE_TO_MIDI_NOTE[0], VOICE_TO_MIDI_NOTE[1]
    path = str(tmp_path / "atten.sf2")
    write_minimal_sf2(path, {
        k0: [{"sample": tone}],
        k1: [{"sample": tone, "atten_cb": 200}],  # -10 dB
    }, sr=sr)
    kit = kit_from_sf2(path, sr)
    p0 = np.max(np.abs(kit[0]))
    p1 = np.max(np.abs(kit[1]))
    np.testing.assert_allclose(p1 / p0, 10 ** (-200 / 200.0), rtol=5e-3)
    np.testing.assert_allclose(p0, 0.9, atol=2e-3)  # kit peak normalized


def test_sf2_overlapping_zones_stack(tmp_path):
    """SF2 zones overlapping in velocity sound simultaneously (fluidsynth
    behavior): the rendered group sample is their sum."""
    from transformergrooveinfilling_tpu.audio.sf2 import (
        kit_from_sf2, write_minimal_sf2)

    sr = 44100
    a = _tone(200.0, 0.05, sr, amp=0.4)
    b = _tone(800.0, 0.03, sr, amp=0.4)
    key = VOICE_TO_MIDI_NOTE[2]
    path = str(tmp_path / "stack.sf2")
    write_minimal_sf2(path, {
        key: [{"sample": a}, {"sample": b}],
    }, sr=sr)
    kit = kit_from_sf2(path, sr)
    got = kit[2]
    expect = a.copy()
    expect[: len(b)] += b
    scale = 0.9 / np.max(np.abs(expect))
    np.testing.assert_allclose(got[:1000], scale * expect[:1000], atol=4e-3)


def test_sf2_loop_sustains(tmp_path):
    """gen 54 (sampleModes=1): a short looped sample must sustain far past
    its raw length (loop unrolled to the synthetic note-off + release)."""
    from transformergrooveinfilling_tpu.audio.sf2 import (
        _MAX_LOOP_SECONDS, kit_from_sf2, write_minimal_sf2)

    sr = 44100
    raw = _tone(441.0, 0.02, sr)  # 20 ms raw sample
    key = VOICE_TO_MIDI_NOTE[8]   # ride
    path = str(tmp_path / "loop.sf2")
    write_minimal_sf2(path, {
        key: [{"sample": raw,
               "loop": (100, len(raw) - 100),
               "release_tc": 0}],  # 1 s release time
    }, sr=sr)
    kit = kit_from_sf2(path, sr)
    s = kit[8]
    # sustains to the synthetic note-off (2 s), far beyond the 20 ms raw
    assert len(s) > _MAX_LOOP_SECONDS * sr
    assert np.max(np.abs(s[int(1.5 * sr): int(1.6 * sr)])) > 0.5
    # the release ramp decays after note-off: quieter at +0.5 s, silent later
    post = np.max(np.abs(s[int(2.4 * sr): int(2.5 * sr)])) if len(s) > int(
        2.5 * sr) else 0.0
    assert post < 0.5
    # non-looped control: same sample without loop stays raw-length
    path2 = str(tmp_path / "noloop.sf2")
    write_minimal_sf2(path2, {key: [{"sample": raw}]}, sr=sr)
    kit2 = kit_from_sf2(path2, sr)
    assert len(kit2[8]) <= len(raw) + 2


def test_sf2_volume_envelope_decay(tmp_path):
    """gens 36/37: decay to the sustain level at 1000 cB per decay-time."""
    from transformergrooveinfilling_tpu.audio.sf2 import (
        kit_from_sf2, write_minimal_sf2)

    sr = 44100
    const = np.full(int(0.5 * sr), 0.8, np.float32)  # DC so the env is legible
    key = VOICE_TO_MIDI_NOTE[0]
    path = str(tmp_path / "env.sf2")
    # decay_tc 0 → 1 s per 1000 cB; sustain 200 cB (-10 dB) reached at 0.2 s
    write_minimal_sf2(path, {
        key: [{"sample": const, "decay_tc": 0, "sustain_cb": 200}],
    }, sr=sr)
    kit = kit_from_sf2(path, sr)
    s = kit[0]
    peak = s[10]  # before any decay
    sustain = s[int(0.3 * sr)]
    np.testing.assert_allclose(sustain / peak, 10 ** (-200 / 200.0), rtol=2e-2)
    # halfway through the decay: -5 dB
    mid = s[int(0.1 * sr)]
    np.testing.assert_allclose(mid / peak, 10 ** (-100 / 200.0), rtol=2e-2)


def test_sf2_layered_kit_device_route_matches_host(tmp_path):
    """The on-device synth (velocity-LUT row selection) must agree with the
    host mixer on a velocity-split kit."""
    from transformergrooveinfilling_tpu.ops.mso import mso_batch_from_hvo
    from transformergrooveinfilling_tpu.audio.sf2 import write_minimal_sf2

    sr = 44100
    soft = _tone(200.0, 0.05, sr)
    hard = _tone(900.0, 0.05, sr)
    kick_key = VOICE_TO_MIDI_NOTE[0]
    path = str(tmp_path / "dev.sf2")
    write_minimal_sf2(path, {
        kick_key: [
            {"sample": soft, "vel_lo": 0, "vel_hi": 63},
            {"sample": hard, "vel_lo": 64, "vel_hi": 127},
        ],
    }, sr=sr)
    rng = np.random.default_rng(3)
    m = 4
    h = (rng.random((m, 32, 9)) < 0.3).astype(np.float32)
    hvo = np.concatenate(
        [h, h * rng.random((m, 32, 9)), np.zeros((m, 32, 9))],
        axis=2).astype(np.float32)
    qpms = np.full((m,), 120.0)
    host = mso_batch_from_hvo(hvo, [path] * m, qpms, device_synth=False)
    dev = mso_batch_from_hvo(hvo, [path] * m, qpms, device_synth=True)
    scale = np.max(np.abs(host)) + 1e-9
    np.testing.assert_allclose(host, dev, atol=2e-5 * scale, rtol=1e-3)


def test_velocity_gain_matches_sf2_default_modulator_curve():
    """The closed-form (v/127)² law must equal the SF2 spec's concave
    default modulator evaluated the long way: att_cB = 400·log10(127/v),
    amplitude = 10^(-att/200) (fluidsynth 2.2.6 fluid_conv.c derivation in
    audio/synth.py::velocity_gain; reference renders every loop through it,
    /root/reference/dataset.py:94)."""
    v = np.arange(1, 128, dtype=np.float64)
    att_cb = 400.0 * np.log10(127.0 / v)
    expected = 10.0 ** (-att_cb / 200.0)
    np.testing.assert_allclose(synth.velocity_gain(v), expected, rtol=1e-6)
    assert synth.velocity_gain(0) == 0.0          # vel-0 note-on is silence
    assert synth.velocity_gain(127) == 1.0


def test_rendered_amplitude_follows_concave_velocity_curve(tmp_path):
    """End to end through synthesize_hvo at several velocities: the peak of
    the render must scale as (round(v·127)/127)² relative to full velocity —
    the square law, measurably different from linear (at v=0.5, 0.25 vs
    0.5)."""
    from transformergrooveinfilling_tpu.audio.sf2 import write_minimal_sf2

    sr = 44100
    tone = _tone(400.0, 0.05, sr)
    kick_key = VOICE_TO_MIDI_NOTE[0]
    path = str(tmp_path / "velcurve.sf2")
    write_minimal_sf2(path, {kick_key: tone}, sr=sr)

    def peak(vel):
        hvo = np.zeros((32, 27), np.float32)
        hvo[0, 0] = 1.0
        hvo[0, 9] = vel
        return float(np.abs(synth.synthesize_hvo(
            hvo, qpm=120, sf_path=path, sr=sr)).max())

    ref = peak(1.0)
    for vel in (0.25, 0.5, 0.75, 0.9):
        vel_midi = np.rint(vel * 127)
        expected = (vel_midi / 127.0) ** 2
        assert abs(peak(vel) / ref - expected) < 1e-3, vel


def test_preset_zone_key_ranges_route_multi_instrument_banks(tmp_path):
    """A bank whose kick and snare live in different instruments, gated by
    preset-zone keyRanges, must route each key to its own instrument
    (sf2 spec §7.3; previously the first instrument with a key-matching
    zone won regardless of preset ranges)."""
    from transformergrooveinfilling_tpu.audio.sf2 import (
        kit_from_sf2, write_minimal_sf2)

    sr = 44100
    kick_tone = _tone(100.0, 0.05, sr)
    snare_tone = _tone(800.0, 0.05, sr)
    kick_key, snare_key = VOICE_TO_MIDI_NOTE[0], VOICE_TO_MIDI_NOTE[1]
    path = str(tmp_path / "multiinst.sf2")
    # both instruments cover BOTH keys internally; only the preset-zone
    # keyRange separates them — honoring it is the thing under test
    write_minimal_sf2(path, instruments=[
        {"samples": {kick_key: kick_tone, snare_key: kick_tone},
         "key_lo": kick_key, "key_hi": kick_key},
        {"samples": {kick_key: snare_tone, snare_key: snare_tone},
         "key_lo": snare_key, "key_hi": snare_key},
    ], sr=sr)
    kit = kit_from_sf2(path, sr)
    n = 1500
    scale = 0.9 / 0.8
    np.testing.assert_allclose(kit[0][:n], scale * kick_tone[:n], atol=3e-3)
    np.testing.assert_allclose(kit[1][:n], scale * snare_tone[:n], atol=3e-3)


def test_preset_zone_vel_ranges_intersect_instrument_zones(tmp_path):
    """The preset zone's velRange must gate velocities even when the
    instrument zone covers 0-127: velocities outside the preset range
    render silence (no zone sounds)."""
    from transformergrooveinfilling_tpu.audio.sf2 import (
        kit_from_sf2, write_minimal_sf2)

    sr = 44100
    tone = _tone(300.0, 0.05, sr)
    kick_key = VOICE_TO_MIDI_NOTE[0]
    path = str(tmp_path / "pvel.sf2")
    write_minimal_sf2(path, instruments=[
        {"samples": {kick_key: tone}, "vel_lo": 64, "vel_hi": 127},
    ], sr=sr)
    kit = kit_from_sf2(path, sr)
    lut = kit.lut[0]
    # velocities below the preset range map to the silence row
    low = kit.samples[lut[32]]
    high = kit.samples[lut[100]]
    assert np.abs(low).max() == 0.0
    assert np.abs(high).max() > 0.1


def test_native_biquad_matches_scipy(rng):
    """The C++ direct-form-I biquad matches scipy.signal.lfilter on the
    same a0-normalized coefficients."""
    from scipy.signal import lfilter

    from transformergrooveinfilling_tpu.audio.native_binding import biquad
    from transformergrooveinfilling_tpu.audio.sf2 import lowpass_coeffs

    x = rng.standard_normal(4096).astype(np.float32)
    b0, b1, b2, a1, a2 = lowpass_coeffs(8000, 150, 44100)
    got = biquad(x, b0, b1, b2, a1, a2)
    ref = lfilter([b0, b1, b2], [1.0, a1, a2], x.astype(np.float64))
    np.testing.assert_allclose(got, ref, atol=2e-5)


def test_sf2_filter_lowpass_attenuates_highs(tmp_path):
    """gens 8/9: a zone with initialFilterFc set renders through
    fluidsynth's two-pole lowpass — a tone well above fc is attenuated to
    the biquad's theoretical response, one well below passes."""
    from transformergrooveinfilling_tpu.audio.sf2 import (
        kit_from_sf2, write_minimal_sf2)

    sr = 44100
    lo = _tone(200.0, 0.06, sr, amp=0.5)
    hi = _tone(6000.0, 0.06, sr, amp=0.5)
    fc_hz = 800.0
    fc_cents = int(round(1200 * np.log2(fc_hz / 8.176)))
    k0, k1, k2 = (VOICE_TO_MIDI_NOTE[i] for i in range(3))
    path = str(tmp_path / "filt.sf2")
    write_minimal_sf2(path, {
        k0: [{"sample": hi, "filter_fc": fc_cents}],
        k1: [{"sample": lo, "filter_fc": fc_cents}],
        k2: [{"sample": hi}],  # unfiltered reference
    }, sr=sr)
    kit = kit_from_sf2(path, sr)
    # steady state (skip the filter transient)
    ss = slice(1000, 2500)
    hi_ratio = np.abs(kit[0][ss]).max() / np.abs(kit[2][ss]).max()
    # |H| of a 2-pole lowpass ~ (fc/f)^2 far above fc: (800/6000)^2 ~ 0.018
    assert hi_ratio < 0.05, hi_ratio
    # below fc the passband is ~unity: same normalization as the reference
    lo_peak = np.abs(kit[1][ss]).max()
    assert lo_peak > 0.8 * np.abs(kit[2][ss]).max()


def test_sf2_filter_default_is_bypass(tmp_path):
    """Explicit spec-default filter generators (fc 13500 cents, Q 0) render
    bit-identically to a zone with no filter generators at all."""
    from transformergrooveinfilling_tpu.audio.sf2 import (
        kit_from_sf2, write_minimal_sf2)

    sr = 44100
    tone = _tone(500.0, 0.05, sr)
    k0, k1 = VOICE_TO_MIDI_NOTE[0], VOICE_TO_MIDI_NOTE[1]
    path = str(tmp_path / "bypass.sf2")
    write_minimal_sf2(path, {
        k0: [{"sample": tone, "filter_fc": 13500, "filter_q_cb": 0}],
        k1: [{"sample": tone}],
    }, sr=sr)
    kit = kit_from_sf2(path, sr)
    np.testing.assert_array_equal(kit[0], kit[1])


def test_sf2_filter_q_resonance(tmp_path):
    """initialFilterQ boosts the response at fc by sqrt(q_lin) after
    fluidsynth's 1/sqrt(q) gain compensation: q = 20 dB -> ~3.16x at fc."""
    from transformergrooveinfilling_tpu.audio.sf2 import (
        kit_from_sf2, write_minimal_sf2)

    sr = 44100
    f = 1000.0
    tone = _tone(f, 0.12, sr, amp=0.3)
    fc_cents = int(round(1200 * np.log2(f / 8.176)))
    k0, k1 = VOICE_TO_MIDI_NOTE[0], VOICE_TO_MIDI_NOTE[1]
    path = str(tmp_path / "reso.sf2")
    write_minimal_sf2(path, {
        k0: [{"sample": tone, "filter_fc": fc_cents, "filter_q_cb": 200}],
        k1: [{"sample": tone, "filter_fc": fc_cents}],
    }, sr=sr)
    kit = kit_from_sf2(path, sr)
    ss = slice(3000, 5000)  # steady state
    ratio = np.abs(kit[0][ss]).max() / np.abs(kit[1][ss]).max()
    np.testing.assert_allclose(ratio, np.sqrt(10.0), rtol=0.1)


def test_sf2_pan_mono_downmix(tmp_path):
    """gen 17: center pan is unity, hard pan lands at 1/sqrt(2), and a
    stereo-style L/R zone pair (pan -500/+500) sums to sqrt(2) x the
    centered level — the mono picture of fluidsynth's equal-power law."""
    from transformergrooveinfilling_tpu.audio.sf2 import (
        kit_from_sf2, write_minimal_sf2)

    sr = 44100
    tone = _tone(400.0, 0.05, sr, amp=0.4)
    k0, k1, k2 = (VOICE_TO_MIDI_NOTE[i] for i in range(3))
    path = str(tmp_path / "pan.sf2")
    write_minimal_sf2(path, {
        k0: [{"sample": tone}],                 # center (default pan 0)
        k1: [{"sample": tone, "pan": 500}],     # hard right
        k2: [{"sample": tone, "pan": -500},     # stereo-style pair
             {"sample": tone, "pan": 500}],
    }, sr=sr)
    kit = kit_from_sf2(path, sr)
    p0, p1, p2 = (np.abs(kit[i]).max() for i in range(3))
    np.testing.assert_allclose(p1 / p0, 1 / np.sqrt(2), rtol=5e-3)
    np.testing.assert_allclose(p2 / p0, np.sqrt(2), rtol=5e-3)


def test_sf2_preset_relative_value_generators(tmp_path):
    """Spec §9.4: preset-zone value generators are DELTAS added to the
    instrument-zone values — a preset-level atten_cb stacks on the zone's
    own attenuation, and a preset-level filter_fc delta shifts the zone's
    cutoff."""
    from transformergrooveinfilling_tpu.audio.sf2 import (
        kit_from_sf2, write_minimal_sf2)

    sr = 44100
    tone = _tone(300.0, 0.05, sr, amp=0.5)
    hi = _tone(6000.0, 0.06, sr, amp=0.5)
    k0, k1 = VOICE_TO_MIDI_NOTE[0], VOICE_TO_MIDI_NOTE[1]
    # instrument zone carries 100 cB, preset zone adds 100 cB -> -10 dB total
    path = str(tmp_path / "prel.sf2")
    write_minimal_sf2(path, instruments=[
        {"samples": {k0: [{"sample": tone, "atten_cb": 100}]},
         "key_lo": k0, "key_hi": k0, "atten_cb": 100},
        {"samples": {k1: tone}, "key_lo": k1, "key_hi": k1},
    ], sr=sr)
    kit = kit_from_sf2(path, sr)
    ratio = np.abs(kit[0]).max() / np.abs(kit[1]).max()
    np.testing.assert_allclose(ratio, 10 ** (-200 / 200.0), rtol=5e-3)

    # preset filter_fc delta: instrument zone at 13500 (bypass default) +
    # a -5000-cent preset delta = 8500 cents ~ 1.1 kHz -> 6 kHz attenuated
    path2 = str(tmp_path / "prelf.sf2")
    write_minimal_sf2(path2, instruments=[
        {"samples": {k0: hi}, "key_lo": k0, "key_hi": k0,
         "filter_fc": -5000},
        {"samples": {k1: hi}, "key_lo": k1, "key_hi": k1},
    ], sr=sr)
    kit2 = kit_from_sf2(path2, sr)
    ss = slice(1000, 2500)
    assert np.abs(kit2[0][ss]).max() < 0.2 * np.abs(kit2[1][ss]).max()


def test_sf2_mod_envelope_filter_sweep(tmp_path):
    """gens 25-30 + 11: the modulation envelope sweeps the filter cutoff —
    with a decaying mod envelope opening then closing the filter, a
    high-frequency tone is bright early and dark late (the percussion
    'filter snap')."""
    from transformergrooveinfilling_tpu.audio.sf2 import (
        kit_from_sf2, write_minimal_sf2)

    sr = 44100
    hi = _tone(6000.0, 0.30, sr, amp=0.5)
    base_fc = int(round(1200 * np.log2(500.0 / 8.176)))   # ~500 Hz closed
    k0, k1 = VOICE_TO_MIDI_NOTE[0], VOICE_TO_MIDI_NOTE[1]
    path = str(tmp_path / "sweep.sf2")
    # mod envelope: instant attack to peak, decay over ~0.19 s
    # (2^(-2400/1200) = 0.25 s nominal) back to sustain 0 — fc sweeps
    # +4800 cents (x16 -> ~8 kHz, open) then back down to 500 Hz
    write_minimal_sf2(path, {
        k0: [{"sample": hi, "filter_fc": base_fc,
              "mod_env_to_filter_fc": 4800, "decay_modenv_tc": -2400,
              "sustain_modenv": 1000}],
        k1: [{"sample": hi}],  # unfiltered reference
    }, sr=sr)
    kit = kit_from_sf2(path, sr)
    ref = np.abs(kit[1])
    got = np.abs(kit[0])
    early = slice(int(0.01 * sr), int(0.05 * sr))    # envelope near peak
    late = slice(int(0.26 * sr), int(0.29 * sr))     # envelope at sustain 0
    early_ratio = got[early].max() / ref[early].max()
    late_ratio = got[late].max() / ref[late].max()
    assert early_ratio > 0.5, early_ratio   # open filter passes 6 kHz
    assert late_ratio < 0.1, late_ratio     # closed filter kills it
    assert early_ratio > 4 * late_ratio


def test_sf2_mod_envelope_default_constant_folds_to_static(tmp_path):
    """An all-default mod envelope (instant DAHD, sustain at peak) with a
    modEnvToFilterFc delta must equal the static filter at fc + delta."""
    from transformergrooveinfilling_tpu.audio.sf2 import (
        kit_from_sf2, write_minimal_sf2)

    sr = 44100
    hi = _tone(3000.0, 0.06, sr, amp=0.5)
    fc = int(round(1200 * np.log2(1000.0 / 8.176)))
    k0, k1 = VOICE_TO_MIDI_NOTE[0], VOICE_TO_MIDI_NOTE[1]
    path = str(tmp_path / "fold.sf2")
    write_minimal_sf2(path, {
        k0: [{"sample": hi, "filter_fc": fc, "mod_env_to_filter_fc": 1200}],
        k1: [{"sample": hi, "filter_fc": fc + 1200}],
    }, sr=sr)
    kit = kit_from_sf2(path, sr)
    np.testing.assert_allclose(kit[0], kit[1], atol=1e-6)


def test_sf2_mod_lfo_tremolo(tmp_path):
    """gens 21/22 + 13 (modLfoToVolume): the delayed-triangle LFO modulates
    amplitude in centibels — windowed peaks oscillate between the +-depth
    attenuation extremes at the LFO rate."""
    from transformergrooveinfilling_tpu.audio.sf2 import (
        kit_from_sf2, write_minimal_sf2)

    sr = 44100
    # 2 kHz tone: a +-1 ms window always contains a tone peak while the
    # 10 Hz LFO's gain moves <3 % inside it (wider windows measured the
    # window-edge gain, not the extreme)
    tone = _tone(2000.0, 0.30, sr, amp=0.4)
    # 10 Hz LFO (cents for 10 Hz: 1200*log2(10/8.176)), depth 60 cB (+-3 dB)
    freq_c = int(round(1200 * np.log2(10.0 / 8.176)))
    k0, k1 = VOICE_TO_MIDI_NOTE[0], VOICE_TO_MIDI_NOTE[1]
    path = str(tmp_path / "trem.sf2")
    write_minimal_sf2(path, {
        k0: [{"sample": tone, "mod_lfo_to_volume": 60,
              "freq_modlfo": freq_c}],
        k1: [{"sample": tone}],
    }, sr=sr)
    kit = kit_from_sf2(path, sr)
    got = np.abs(kit[0])
    # LFO period 0.1 s: trough of gain at t=0.025 (val=+1 -> -3 dB),
    # peak at t=0.075 (val=-1 -> +3 dB); windows of 10 ms around each
    w = int(0.001 * sr)
    trough = got[int(0.025 * sr) - w : int(0.025 * sr) + w].max()
    peak = got[int(0.075 * sr) - w : int(0.075 * sr) + w].max()
    np.testing.assert_allclose(peak / trough, 10 ** (2 * 60 / 200.0),
                               rtol=0.05)
    # the unmodulated sibling is flat across the same windows
    ref = np.abs(kit[1])
    r = ref[int(0.075 * sr) - w : int(0.075 * sr) + w].max() / \
        ref[int(0.025 * sr) - w : int(0.025 * sr) + w].max()
    np.testing.assert_allclose(r, 1.0, rtol=0.02)


def test_sf2_vib_lfo_pitch(tmp_path):
    """gens 23/24 + 6 (vibLfoToPitch): vibrato raises the instantaneous
    pitch while the LFO rises — more zero crossings late than early for a
    slow LFO whose first quarter-period spans the render."""
    from transformergrooveinfilling_tpu.audio.sf2 import (
        kit_from_sf2, write_minimal_sf2)

    sr = 44100
    tone = _tone(500.0, 0.25, sr, amp=0.4)
    # ~1 Hz LFO: value ramps 0 -> 1 over the first 0.25 s
    freq_c = int(round(1200 * np.log2(1.0 / 8.176)))
    k0, k1 = VOICE_TO_MIDI_NOTE[0], VOICE_TO_MIDI_NOTE[1]
    path = str(tmp_path / "vib.sf2")
    write_minimal_sf2(path, {
        k0: [{"sample": tone, "vib_lfo_to_pitch": 1200,
              "freq_viblfo": freq_c}],
        k1: [{"sample": tone}],
    }, sr=sr)
    kit = kit_from_sf2(path, sr)

    def crossings(y):
        return int(np.sum(np.signbit(y[:-1]) != np.signbit(y[1:])))

    n = len(kit[0])
    early = crossings(kit[0][: int(0.05 * sr)])
    late = crossings(kit[0][n - int(0.05 * sr):])
    # pitch rises toward +1200 cents at the LFO peak; the output ends
    # early (rising pitch consumes input faster), so the last window sits
    # below the full doubling -- measured ~1.5x
    assert late > 1.35 * early, (early, late)
    # unmodulated renders identically to the source tone rate
    e1 = crossings(kit[1][: int(0.05 * sr)])
    l1 = crossings(kit[1][-int(0.05 * sr):])
    assert abs(e1 - l1) <= 2, (e1, l1)


def test_sf2_mod_lfo_filter_sweep(tmp_path):
    """gen 10 (modLfoToFilterFc): the LFO's rise opens the filter — a tone
    above the base cutoff is dark early and bright near the LFO peak."""
    from transformergrooveinfilling_tpu.audio.sf2 import (
        kit_from_sf2, write_minimal_sf2)

    sr = 44100
    hi = _tone(6000.0, 0.30, sr, amp=0.4)
    base_fc = int(round(1200 * np.log2(500.0 / 8.176)))
    freq_c = int(round(1200 * np.log2(1.0 / 8.176)))  # ~1 Hz
    k0 = VOICE_TO_MIDI_NOTE[0]
    path = str(tmp_path / "lfofilt.sf2")
    write_minimal_sf2(path, {
        k0: [{"sample": hi, "filter_fc": base_fc,
              "mod_lfo_to_filter_fc": 4800, "freq_modlfo": freq_c}],
    }, sr=sr)
    kit = kit_from_sf2(path, sr)
    got = np.abs(kit[0])
    early = got[int(0.01 * sr): int(0.04 * sr)].max()   # LFO near 0: closed
    open_ = got[int(0.22 * sr): int(0.25 * sr)].max()   # LFO near +1: open
    assert open_ > 4 * early, (early, open_)
