"""SoundFont 2 (.sf2) reader → per-voice drum sample table.

The reference renders every loop through fluidsynth with downloadable .sf2 drum
kits (environment.yaml: fluidsynth 2.2.6; dataset sf_path kwarg,
/root/reference/dataset.py:94). This is a self-contained reader of the SF2
format's RIFF structure (spec: SoundFont 2.01) that resolves, for each of the 9
HVO voices' representative General-MIDI percussion keys, the sample a
percussion preset maps to — sample pool extraction, root-key pitch shift, and
sample-rate conversion through the native linear resampler.

Scope: one-shot percussion playback (no modulators/filter envelopes/loops) —
the part of the SF2 feature set the drum-rendering pipeline exercises.
"""

from __future__ import annotations

import functools
import struct

import numpy as np

from ..hvo.mapping import VOICE_TO_MIDI_NOTE

# SF2 generator opcodes used
_GEN_INSTRUMENT = 41
_GEN_KEY_RANGE = 43
_GEN_OVERRIDING_ROOT_KEY = 58
_GEN_SAMPLE_ID = 53


class SF2Error(ValueError):
    pass


def _read_chunks(data: bytes, start: int, end: int):
    """Yield (fourcc, payload_start, payload_size) for RIFF subchunks."""
    pos = start
    while pos + 8 <= end:
        fourcc = data[pos : pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        yield fourcc, pos + 8, size
        pos += 8 + size + (size & 1)


def parse_sf2(path: str) -> dict:
    """Parse the chunks needed for drum rendering → dict of tables."""
    with open(path, "rb") as f:
        data = f.read()
    if data[:4] != b"RIFF" or data[8:12] != b"sfbk":
        raise SF2Error(f"not a SoundFont file: {path}")

    smpl = None
    pdta = {}
    for fourcc, off, size in _read_chunks(data, 12, len(data)):
        if fourcc != b"LIST":
            continue
        list_type = data[off : off + 4]
        for sub4, soff, ssize in _read_chunks(data, off + 4, off + size):
            if list_type == b"sdta" and sub4 == b"smpl":
                smpl = np.frombuffer(data, dtype="<i2", count=ssize // 2,
                                     offset=soff)
            elif list_type == b"pdta":
                pdta[sub4.decode("ascii", "replace")] = data[soff : soff + ssize]
    if smpl is None or "phdr" not in pdta:
        raise SF2Error(f"missing sdta/pdta chunks in {path}")

    phdr = [
        struct.unpack_from("<20sHHHIII", pdta["phdr"], i)
        for i in range(0, len(pdta["phdr"]) - 38, 38)  # last record is EOP
    ]
    pbag = [struct.unpack_from("<HH", pdta["pbag"], i)
            for i in range(0, len(pdta["pbag"]), 4)]
    pgen = [struct.unpack_from("<Hh", pdta["pgen"], i)
            for i in range(0, len(pdta["pgen"]), 4)]
    inst = [struct.unpack_from("<20sH", pdta["inst"], i)
            for i in range(0, len(pdta["inst"]), 22)]
    ibag = [struct.unpack_from("<HH", pdta["ibag"], i)
            for i in range(0, len(pdta["ibag"]), 4)]
    igen = [struct.unpack_from("<Hh", pdta["igen"], i)
            for i in range(0, len(pdta["igen"]), 4)]
    shdr = [
        struct.unpack_from("<20sIIIIIBbHH", pdta["shdr"], i)
        for i in range(0, len(pdta["shdr"]) - 46, 46)  # last record is EOS
    ]
    return {
        "smpl": smpl, "phdr": phdr, "pbag": pbag, "pgen": pgen,
        "inst": inst, "ibag": ibag, "igen": igen, "shdr": shdr,
    }


def _preset_instruments(sf: dict, bank_preference=(128, 0)):
    """Instrument indices reachable from the first percussion preset found
    (bank 128 preferred, else bank 0 preset 0)."""
    for want_bank in bank_preference:
        for p_idx, (name, preset, bank, bag_ndx, *_rest) in enumerate(
                sf["phdr"]):
            if bank != want_bank:
                continue
            next_bag = (sf["phdr"][p_idx + 1][3] if p_idx + 1 < len(sf["phdr"])
                        else len(sf["pbag"]))
            instruments = []
            for bag in range(bag_ndx, next_bag):
                gen_start = sf["pbag"][bag][0]
                gen_end = (sf["pbag"][bag + 1][0] if bag + 1 < len(sf["pbag"])
                           else len(sf["pgen"]))
                for oper, amount in sf["pgen"][gen_start:gen_end]:
                    if oper == _GEN_INSTRUMENT:
                        # genAmount is a union: instrument IDs are unsigned
                        # words, but the record parses as signed (value
                        # generators need the sign) — reinterpret
                        instruments.append(amount & 0xFFFF)
            if instruments:
                return instruments
    raise SF2Error("no percussion (bank 128) or default preset found")


def _zones_for_instrument(sf: dict, inst_idx: int):
    """[(key_lo, key_hi, root_key_override, sample_id)] for an instrument."""
    bag_start = sf["inst"][inst_idx][1]
    bag_end = (sf["inst"][inst_idx + 1][1] if inst_idx + 1 < len(sf["inst"])
               else len(sf["ibag"]))
    zones = []
    for bag in range(bag_start, bag_end):
        gen_start = sf["ibag"][bag][0]
        gen_end = (sf["ibag"][bag + 1][0] if bag + 1 < len(sf["ibag"])
                   else len(sf["igen"]))
        key_lo, key_hi, root, sample_id = 0, 127, None, None
        for oper, amount in sf["igen"][gen_start:gen_end]:
            if oper == _GEN_KEY_RANGE:
                raw = amount & 0xFFFF
                key_lo, key_hi = raw & 0xFF, (raw >> 8) & 0xFF
            elif oper == _GEN_OVERRIDING_ROOT_KEY:
                root = amount
            elif oper == _GEN_SAMPLE_ID:
                sample_id = amount & 0xFFFF  # unsigned word (ID, not value)
        if sample_id is not None:
            zones.append((key_lo, key_hi, root, sample_id))
    return zones


def _render_key(sf: dict, zones, key: int, sr: int) -> np.ndarray | None:
    for key_lo, key_hi, root, sample_id in zones:
        if not (key_lo <= key <= key_hi):
            continue
        (name, start, end, loop_s, loop_e, rate, orig_pitch, pitch_corr,
         _link, _stype) = sf["shdr"][sample_id]
        raw = sf["smpl"][start:end].astype(np.float32) / 32768.0
        if len(raw) < 2:
            continue
        root_key = root if root is not None else (
            orig_pitch if orig_pitch <= 127 else 60)
        semitones = key - root_key + pitch_corr / 100.0
        ratio = (rate / sr) * (2.0 ** (semitones / 12.0))
        from .native_binding import resample_linear

        try:
            out = resample_linear(raw, ratio)
        except Exception:  # no compiler: numpy fallback
            n = max(int((len(raw) - 1) / ratio), 0)
            pos = np.arange(n) * ratio
            i0 = pos.astype(np.int64)
            frac = (pos - i0).astype(np.float32)
            out = raw[i0] * (1 - frac) + raw[i0 + 1] * frac
        return out
    return None


@functools.lru_cache(maxsize=16)
def kit_from_sf2(path: str, sr: int = 44100) -> tuple:
    """Sample table in HVO voice order from a .sf2's percussion preset.

    Voices whose key has no zone fall back to the procedural kit's sample for
    that voice (so partial drum soundfonts still render every voice).
    """
    from .drumkit import default_kit

    fallback = default_kit(sr)  # internal code: its bugs must NOT be
    # reported as a malformed input file, so it stays outside the guard
    # below. Malformed .sf2 content must fail as SF2Error (a ValueError),
    # never leak an IndexError/struct.error/ZeroDivisionError from
    # inconsistent bag/gen/sample tables — the same never-crash-ungracefully
    # contract as the SMF parser (data/midi.py, tests/test_midi.py fuzz).
    try:
        sf = parse_sf2(path)
        zone_lists = [
            _zones_for_instrument(sf, i)
            for i in _preset_instruments(sf)
            if i < len(sf["inst"])
        ]
        rendered = {}
        for voice, key in enumerate(VOICE_TO_MIDI_NOTE):
            for zones in zone_lists:
                sample = _render_key(sf, zones, key, sr)
                if sample is not None:
                    rendered[voice] = sample
                    break
    except SF2Error:
        raise
    except (struct.error, IndexError, KeyError, ZeroDivisionError,
            OverflowError, FloatingPointError) as e:
        raise SF2Error(f"malformed SoundFont {path}: {e!r}") from e

    table = []
    for voice in range(len(VOICE_TO_MIDI_NOTE)):
        sample = rendered.get(voice, fallback[voice])
        peak = float(np.max(np.abs(sample)))
        if peak > 1e-6:
            sample = 0.9 * sample / peak
        table.append(np.ascontiguousarray(sample, np.float32))
    return tuple(table)


def write_minimal_sf2(path: str, samples: dict[int, np.ndarray],
                      sr: int = 44100, name: str = "TGI Kit"):
    """Write a minimal valid percussion SoundFont (one instrument, one zone per
    key) — used for test fixtures and to export the procedural kit as .sf2."""
    keys = sorted(samples)
    pool = []
    shdr_entries = []
    pos = 0
    for key in keys:
        pcm = np.clip(np.asarray(samples[key], np.float32), -1, 1)
        pcm16 = (pcm * 32767).astype("<i2")
        pool.append(pcm16)
        pool.append(np.zeros(46, "<i2"))  # spec: 46 zero points after sample
        shdr_entries.append((pos, pos + len(pcm16), sr, key))
        pos += len(pcm16) + 46
    smpl = np.concatenate(pool) if pool else np.zeros(0, "<i2")

    def chunk(fourcc: bytes, payload: bytes) -> bytes:
        pad = b"\0" if len(payload) & 1 else b""
        return fourcc + struct.pack("<I", len(payload)) + payload + pad

    def zstr(s: str, n: int) -> bytes:
        b = s.encode()[: n - 1]
        return b + b"\0" * (n - len(b))

    # INFO
    info = chunk(b"LIST", b"INFO"
                 + chunk(b"ifil", struct.pack("<HH", 2, 1))
                 + chunk(b"isng", zstr("EMU8000", 8))
                 + chunk(b"INAM", zstr(name, 20)))
    sdta = chunk(b"LIST", b"sdta" + chunk(b"smpl", smpl.tobytes()))

    # pdta: one preset (bank 128, preset 0) → one instrument → zone per key
    phdr = (struct.pack("<20sHHHIII", zstr("DrumKit", 20), 0, 128, 0, 0, 0, 0)
            + struct.pack("<20sHHHIII", zstr("EOP", 20), 0, 0, 1, 0, 0, 0))
    pbag = struct.pack("<HH", 0, 0) + struct.pack("<HH", 1, 0)
    pgen = struct.pack("<Hh", _GEN_INSTRUMENT, 0)
    pmod = b"\0" * 10
    inst = (struct.pack("<20sH", zstr("Drums", 20), 0)
            + struct.pack("<20sH", zstr("EOI", 20), len(keys)))
    ibag = b"".join(struct.pack("<HH", 3 * i, 0) for i in range(len(keys)))
    ibag += struct.pack("<HH", 3 * len(keys), 0)
    igen = b""
    for i, key in enumerate(keys):
        igen += struct.pack("<HH", _GEN_KEY_RANGE, key | (key << 8))
        igen += struct.pack("<Hh", _GEN_OVERRIDING_ROOT_KEY, key)
        igen += struct.pack("<Hh", _GEN_SAMPLE_ID, i)
    imod = b"\0" * 10
    shdr = b""
    for i, (start, end, rate, key) in enumerate(shdr_entries):
        shdr += struct.pack("<20sIIIIIBbHH", zstr(f"smp{keys[i]}", 20),
                            start, end, start, max(end - 1, start), rate,
                            key, 0, 0, 1)
    shdr += struct.pack("<20sIIIIIBbHH", zstr("EOS", 20), 0, 0, 0, 0, 0, 0, 0,
                        0, 0)
    pdta = chunk(b"LIST", b"pdta"
                 + chunk(b"phdr", phdr) + chunk(b"pbag", pbag)
                 + chunk(b"pmod", pmod) + chunk(b"pgen", pgen)
                 + chunk(b"inst", inst) + chunk(b"ibag", ibag)
                 + chunk(b"imod", imod) + chunk(b"igen", igen)
                 + chunk(b"shdr", shdr))

    body = b"sfbk" + info + sdta + pdta
    with open(path, "wb") as f:
        f.write(b"RIFF" + struct.pack("<I", len(body)) + body)
    return path
