"""HVO → waveform rendering (the fluidsynth-equivalent, SURVEY.md §2.3).

An HVO grid renders as sample accumulation: for every hit, its voice's sample —
from the procedural kit or a parsed SoundFont — is added at the hit's onset time
(grid step + fractional offset, in 16th-note units at the loop's tempo), scaled
by the SF2 default modulator's velocity gain (:func:`velocity_gain`). The
accumulation loop runs in native C++ when the extension is built
(audio/native/sf2synth.cpp via ctypes), with an identical numpy fallback.

WAV I/O uses the stdlib ``wave`` module (no soundfile dependency).
"""

from __future__ import annotations

import os
import wave

import numpy as np

from .drumkit import default_kit, kit_layers

_TAIL_SECONDS = 1.0  # let the last hits ring out (cymbal decay)


def velocity_gain(vel_midi):
    """MIDI velocity → amplitude per the SF2 default modulator, closed form.

    SF2 spec §8.4.2's first default modulator routes note-on velocity through
    a *concave, unipolar, negative* curve into initialAttenuation with 960 cB
    amount. fluidsynth 2.2.6 (the reference's renderer,
    /root/reference/environment.yaml:14) implements the curve as
    ``att_cB(v) = -(200/960)·960·log10(v²/127²) = 400·log10(127/v)``
    (fluid_conv.c concave table), so the amplitude factor collapses to
    exactly ``10^(-att/200) = (v/127)²`` for v in [1,127] — a square law,
    not the linear scaling a naive velocity→amplitude map gives. v = 0 is a
    MIDI note-off and renders silence.

    Takes/returns numpy arrays or scalars; vel_midi in [0, 127].
    """
    v = np.asarray(vel_midi, np.float32) / np.float32(127.0)
    return v * v


def _sample_table(sf_path: str | None, sr: int):
    if sf_path is None:
        return default_kit(sr)
    from .sf2 import kit_from_sf2  # lazy: only when a .sf2 is actually used

    return kit_from_sf2(sf_path, sr)


def steps_per_second(qpm: float) -> float:
    """16th-note grid steps per second at the given tempo."""
    return (qpm / 60.0) * 4.0


def synthesize_hvo(hvo: np.ndarray, qpm: float = 120.0,
                   sf_path: str | None = None, sr: int = 44100) -> np.ndarray:
    """Render one ``(T, 3V)`` grid to a float32 waveform."""
    return synthesize_hvo_batch(
        np.asarray(hvo)[None], np.asarray([qpm]), [sf_path], sr=sr)[0]


def synthesize_hvo_list(hvos, qpms, sf_paths, sr: int = 44100) -> list:
    """Render ``M`` loops in ONE batched mixer call, returning per-item
    waveforms bit-identical to ``M`` separate ``synthesize_hvo`` calls.

    The eval media path renders a few hundred sampled loops per media epoch
    (reference evaluator.py:425-499 does this one fluidsynth call at a time);
    batching keeps the native mixer's one-call/threaded path while each item
    still gets its own length (its loop at its own tempo + its own table's
    ring-out margin) and its own peak normalization.
    """
    hvos = np.asarray(hvos, dtype=np.float32)
    m, t, _ = hvos.shape
    if m == 0:
        return []
    qpms = np.asarray(qpms, dtype=np.float64)
    if qpms.size == 1:  # scalar qpm broadcasts, 0-d included (m == 1 too)
        qpms = np.full((m,), float(qpms))
    sps = steps_per_second(qpms)

    # per-item B=1 buffer lengths: loop + max(tail, its own table's longest
    # sample) — exactly what synthesize_hvo computes for that item alone
    unique_sfs = list(dict.fromkeys(sf_paths))
    tables = {sf: _sample_table(sf, sr) for sf in unique_sfs}
    margin = {
        sf: max(int(_TAIL_SECONDS * sr),
                max((len(s) for s in kit_layers(tables[sf])[0]), default=0))
        for sf in unique_sfs
    }
    item_len = [int(np.ceil(t / sps[i] * sr)) + margin[sf_paths[i]]
                for i in range(m)]

    out = synthesize_hvo_batch(hvos, qpms, sf_paths, sr=sr,
                               fixed_length=max(item_len), normalize=False)
    waves = []
    for i in range(m):
        y = out[i, :item_len[i]].copy()
        peak = np.max(np.abs(y), initial=1e-9)
        if peak > 1.0:
            y /= peak
        waves.append(y)
    return waves


def synthesize_hvo_batch(hvos: np.ndarray, qpms, sf_paths, sr: int = 44100,
                         fixed_length: int | None = None,
                         normalize: bool = True) -> np.ndarray:
    """Render a stacked ``(M, T, 3V)`` batch → ``(M, L)`` float32 waveforms.

    All loops in a batch are padded to a common length (the slowest tempo's loop
    + ring-out tail), so the result stacks cleanly for the batched on-device MSO
    DSP.
    """
    hvos = np.asarray(hvos, dtype=np.float32)
    m, t, width = hvos.shape
    n_voices = width // 3
    qpms = np.asarray(qpms, dtype=np.float64)
    if qpms.size == 1 and m > 1:
        qpms = np.full((m,), float(qpms))

    sps = steps_per_second(qpms)  # (M,) steps/sec
    loop_len = t / sps            # seconds

    # sample tables are lru-cached per (soundfont, sr); a batch with K distinct
    # soundfonts concatenates their flat zone samples once, and events address
    # the union via (base offset + velocity-layer LUT) — the whole batch stays
    # ONE native mix call even with velocity-split kits
    unique_sfs = list(dict.fromkeys(sf_paths))
    tables = {sf: _sample_table(sf, sr) for sf in unique_sfs}
    base_arr = np.zeros(len(unique_sfs), np.int64)
    lut_list = []
    combined: list = []
    for k, sf in enumerate(unique_sfs):
        flat, lut = kit_layers(tables[sf])
        base_arr[k] = len(combined)
        combined.extend(flat)
        lut_list.append(lut)
    luts = np.stack(lut_list) if lut_list else np.zeros((0, 0, 128), np.int32)
    sf_to_k = {sf: k for k, sf in enumerate(unique_sfs)}
    max_sample = max((len(s) for s in combined), default=0)
    if fixed_length is None:
        fixed_length = int(np.ceil(loop_len.max() * sr)) + max(
            int(_TAIL_SECONDS * sr), max_sample)

    out = np.zeros((m, fixed_length), dtype=np.float32)

    # vectorized event extraction over the whole batch: np.nonzero is row-major,
    # so events come out already grouped by item in item order
    items, steps, voices = np.nonzero(hvos[:, :, :n_voices] > 0)
    if items.size:
        offs = hvos[items, steps, 2 * n_voices + voices]
        vels = hvos[items, steps, n_voices + voices].astype(np.float32)
        onsets = np.clip((steps + offs) / sps[items] * sr,
                         0, fixed_length - 1).astype(np.int64)
        # velocity-layer selection: MIDI velocity picks the zone group;
        # amplitude follows the SF2 default modulator's square law
        # (velocity_gain), as fluidsynth applies to every note
        item_k = np.asarray([sf_to_k[sf] for sf in sf_paths], np.int64)[items]
        vel_midi = np.clip(np.rint(vels * 127).astype(np.int64), 0, 127)
        gains = velocity_gain(vel_midi)
        voice_idx = (base_arr[item_k]
                     + luts[item_k, voices, vel_midi]).astype(np.int32)
        event_offsets = np.zeros(m + 1, np.int64)
        np.cumsum(np.bincount(items, minlength=m), out=event_offsets[1:])
        try:
            from .native_binding import mix_batch_native

            mix_batch_native(out, combined, voice_idx, onsets, gains,
                             event_offsets)
        except Exception:
            for i in range(m):
                lo, hi = event_offsets[i], event_offsets[i + 1]
                _mix_events_numpy(out[i], combined, voice_idx[lo:hi],
                                  onsets[lo:hi], gains[lo:hi])

    # prevent clipping without changing an item's internal dynamics —
    # per item: one loud loop must not rescale the rest of its batch
    # (MSO is per-item scale-invariant either way, ops/mso.py:202)
    if normalize:
        peak = np.max(np.abs(out), axis=-1, keepdims=True, initial=1e-9)
        np.divide(out, peak, out=out, where=peak > 1.0)
    return out


def _mix_events_numpy(buf: np.ndarray, table, voices: np.ndarray,
                      onsets: np.ndarray, vels: np.ndarray):
    n = len(buf)
    for voice, onset, vel in zip(voices, onsets, vels):
        s = table[voice]
        end = min(onset + len(s), n)
        if end > onset:
            buf[onset:end] += vel * s[: end - onset]


def write_wav(filename: str, y: np.ndarray, sr: int = 44100):
    os.makedirs(os.path.dirname(filename) or ".", exist_ok=True)
    pcm = np.clip(np.asarray(y), -1.0, 1.0)
    pcm16 = (pcm * 32767.0).astype("<i2")
    with wave.open(filename, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(pcm16.tobytes())


def read_wav(filename: str):
    with wave.open(filename, "rb") as w:
        sr = w.getframerate()
        n = w.getnframes()
        raw = np.frombuffer(w.readframes(n), dtype="<i2")
    return raw.astype(np.float32) / 32767.0, sr
