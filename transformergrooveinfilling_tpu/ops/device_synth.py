"""On-device drum-loop synthesis: HVO events → waveform, entirely on the TPU.

The host-side C++ mixer (audio/native/sf2synth.cpp) is the fluidsynth
equivalent for offline/WAV work, but on a training host with a thin
host↔device link the *transfer* of rendered waveforms dominates the audio
front end (~47 MB per 64-item chunk vs 221 KB of HVO grids). Synthesis is a
sum of velocity-scaled, time-shifted samples — linear in the events — so it
maps cleanly onto the device:

    HVO grid (M, T, 3V)  →  fixed-size event list (argsort of the hit plane)
    →  lax.scan over events of batched dynamic-slice adds into the waveform
    →  (M, L) float32 waves, already resident for the MSO DSP

The per-voice sample table ships once (a few MB, cached on device) and every
subsequent batch moves only its grids. Event count is static at T*V (=288):
every possible cell is processed, hit or not (masked events add zero), so the
result is exact, shape-static, and recompile-free. HBM traffic is
~2·E·M·S_max floats per chunk — single-digit milliseconds on a v4 chip.

Numerics match audio/synth.py::synthesize_hvo_batch (same onset truncation,
same clipping rule is irrelevant here because ops/mso.py normalizes per item);
parity is pinned in tests/test_device_synth.py.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_table_cache: dict = {}
_LANES = 128


def pack_tables(sf_paths, sr: int = 44100, s_max: int | None = None):
    """Build the device-resident sample table for a set of soundfonts.

    Returns ``(table, base, luts, sf_index)``: ``table`` is ``(R, S_max)``
    float32 (every soundfont's flat zone samples, zero-padded to the longest),
    ``base`` maps soundfont path → row offset of its first sample, ``luts``
    is ``(K, V, 128)`` int32 mapping (soundfont, voice, MIDI velocity) →
    *local* table row (velocity-layered kits, audio/sf2.py), and
    ``sf_index`` maps soundfont path → its ``luts`` index. Cached per
    (soundfonts, sr) so streaming callers pay the pack + transfer once.
    """
    from ..audio.drumkit import kit_layers
    from ..audio.synth import _sample_table

    unique = list(dict.fromkeys(sf_paths))
    key = (tuple(unique), sr, s_max)
    if key in _table_cache:
        return _table_cache[key]
    layered = {sf: kit_layers(_sample_table(sf, sr)) for sf in unique}
    if s_max is None:
        s_max = max((len(s) for flat, _ in layered.values() for s in flat),
                    default=1)
    s_max = -(-s_max // _LANES) * _LANES  # lane-aligned for the Pallas kernel
    rows = []
    base = {}
    lut_list = []
    sf_index = {}
    for k, sf in enumerate(unique):
        flat, lut = layered[sf]
        base[sf] = len(rows)
        sf_index[sf] = k
        lut_list.append(np.asarray(lut, np.int32))
        for s in flat:
            row = np.zeros(s_max, np.float32)
            row[: min(len(s), s_max)] = s[:s_max]
            rows.append(row)
    packed = jnp.asarray(np.stack(rows)) if rows else jnp.zeros((1, s_max))
    luts = jnp.asarray(np.stack(lut_list)) if lut_list else jnp.zeros(
        (1, 1, 128), jnp.int32)
    result = (packed, base, luts, sf_index)
    _table_cache[key] = result
    return result


def _extract_events(hvos, sps, sf_base, length: int, sr: float,
                    luts=None, sf_k=None):
    """(M, T, 3V) grids → flat per-cell event arrays (onset, row, vel), each
    (M, T·V). Every cell is an "event"; non-hits carry velocity 0.

    With ``luts`` (K, V, 128) + ``sf_k`` (M,), the sample row is selected by
    MIDI velocity through the kit's velocity-layer LUT (rounding matches the
    host route's ``np.rint``); otherwise row = sf_base + voice."""
    m, t, width = hvos.shape
    v = width // 3
    h = hvos[:, :, :v].reshape(m, t * v)
    vel = hvos[:, :, v:2 * v].reshape(m, t * v)
    off = hvos[:, :, 2 * v:].reshape(m, t * v)

    cell = jnp.arange(t * v)
    step = (cell // v).astype(jnp.float32)
    voice = (cell % v).astype(jnp.int32)

    onset = (step[None, :] + off) / sps[:, None] * sr
    onset = jnp.clip(onset, 0, length - 1).astype(jnp.int32)  # trunc == host
    vel_midi = jnp.clip(jnp.round(vel * 127.0), 0, 127).astype(jnp.int32)
    if luts is None:
        row = (sf_base[:, None] + voice[None, :]).astype(jnp.int32)
    else:
        row = (sf_base[:, None]
               + luts[sf_k[:, None], voice[None, :], vel_midi]).astype(
                   jnp.int32)
    # SF2 default-modulator velocity gain: amplitude = (v/127)², the closed
    # form of fluidsynth's concave vel→attenuation curve
    # (audio/synth.py::velocity_gain — keep both routes bit-consistent)
    gain = (vel_midi.astype(jnp.float32) / 127.0) ** 2
    gain = jnp.where(h > 0, gain, 0.0).astype(jnp.float32)
    return onset, row, gain


def _synth_scan(onset, row, vel, table, length: int) -> jnp.ndarray:
    """XLA fallback: scan over events of batched dynamic-slice adds. Correct
    everywhere, but the vmapped update lowers to a scatter that rewrites the
    whole carry per event — use the Pallas kernel on real TPUs."""
    m = onset.shape[0]
    s_max = table.shape[1]
    y0 = jnp.zeros((m, length + s_max), jnp.float32)

    def body(y, ev):
        onset_e, vel_e, row_e = ev  # each (M,)
        seg = jax.vmap(
            lambda yi, o: jax.lax.dynamic_slice(yi, (o,), (s_max,)))(y, onset_e)
        seg = seg + vel_e[:, None] * table[row_e]
        y = jax.vmap(
            lambda yi, s, o: jax.lax.dynamic_update_slice(yi, s, (o,)))(
                y, seg, onset_e)
        return y, None

    y, _ = jax.lax.scan(body, y0, (onset.T, vel.T, row.T))
    return y[:, :length]


def _synth_kernel(i, onset_ref, row_ref, vel_ref, table_ref, out_ref):
    """One grid program = one loop item. The item's whole waveform lives in
    VMEM as a (rows, 128) tile; each event adds its velocity-scaled sample at
    an arbitrary sample offset via lane rotation + one-row spill:

        flat offset o = 128·q + r
        rolled  = roll(sample ++ zero_row, r, axis=lanes)   (same-row part)
        spill   = rolled shifted down one sublane row        (lanes < r part)
        out[q : q+S/128+1] += where(lane < r, spill, rolled)

    All stores are sublane-aligned (the dynamic start q indexes whole rows),
    which is what the VPU wants; the only dynamic-lane op is the rotation.
    Masked cells (vel == 0) are skipped entirely.
    """
    n_events = onset_ref.shape[1]
    s_rows = table_ref.shape[1]  # table is (V, s_rows, 128)
    out_ref[...] = jnp.zeros(out_ref.shape, out_ref.dtype)
    lane = jax.lax.broadcasted_iota(jnp.int32, (s_rows + 1, _LANES), 1)

    def body(e, _):
        vel = vel_ref[i, e]

        @pl.when(vel != 0.0)
        def _():
            onset = onset_ref[i, e]
            q = onset // _LANES
            r = onset % _LANES
            samp = table_ref[row_ref[i, e]] * vel  # (s_rows, 128)
            padded = jnp.concatenate(
                [samp, jnp.zeros((1, _LANES), samp.dtype)], axis=0)
            rolled = pltpu.roll(padded, shift=r, axis=1)
            spill = jnp.concatenate(
                [jnp.zeros((1, _LANES), samp.dtype), rolled[:-1]], axis=0)
            add = jnp.where(lane < r, spill, rolled)
            cur = out_ref[0, pl.ds(q, s_rows + 1), :]
            out_ref[0, pl.ds(q, s_rows + 1), :] = cur + add

        return 0

    jax.lax.fori_loop(0, n_events, body, 0)


def _synth_pallas(onset, row, vel, table, length: int,
                  interpret: bool = False) -> jnp.ndarray:
    m, n_events = onset.shape
    s_max = table.shape[1]
    assert s_max % _LANES == 0, "pack_tables pads samples to lane multiples"
    out_rows = -(-(length + s_max + _LANES) // _LANES)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,  # onset, row, vel → SMEM, available up front
        grid=(m,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],  # table, shared
        out_specs=pl.BlockSpec((1, out_rows, _LANES), lambda i, *_: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    )

    def kernel(onset_all, row_all, vel_all, table_ref, out_ref):
        _synth_kernel(pl.program_id(0), onset_all, row_all, vel_all,
                      table_ref, out_ref)

    table3 = table.reshape(table.shape[0], s_max // _LANES, _LANES)
    y = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((m, out_rows, _LANES), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(onset, row, vel, table3)
    return y.reshape(m, out_rows * _LANES)[:, :length]


@partial(jax.jit, static_argnames=("length", "use_pallas"))
def synthesize_on_device(hvos: jnp.ndarray, sps: jnp.ndarray,
                         table: jnp.ndarray, sf_base: jnp.ndarray,
                         length: int, sr: float = 44100.0,
                         use_pallas: bool | None = None,
                         luts: jnp.ndarray | None = None,
                         sf_k: jnp.ndarray | None = None) -> jnp.ndarray:
    """Render ``(M, T, 3V)`` grids to ``(M, length)`` waveforms on device.

    ``sps``: (M,) grid steps/second. ``table``: (R, S_max) packed samples.
    ``sf_base``: (M,) int32 row offset of each item's soundfont in the table.
    ``luts``/``sf_k`` (optional, from :func:`pack_tables`): velocity-layer
    row selection for layered kits; omitted = one row per voice.
    ``use_pallas`` default: the VMEM event kernel on TPU, XLA scan elsewhere.
    """
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    onset, row, vel = _extract_events(hvos, sps, sf_base, length, sr,
                                      luts, sf_k)
    if use_pallas:
        return _synth_pallas(onset, row, vel, table, length)
    return _synth_scan(onset, row, vel, table, length)


@partial(jax.jit, static_argnames=("length", "n_steps", "params"))
def _front_end(hvos, sps, table, sf_base, length, n_steps, params,
               luts=None, sf_k=None):
    from .mso import mso_batch

    waves = synthesize_on_device(hvos, sps, table, sf_base, length,
                                 luts=luts, sf_k=sf_k)
    return mso_batch(waves, sps, n_steps, params)


def mso_batch_from_hvo_device(hvos, soundfonts, qpms, params=None,
                              chunk_size: int = 64) -> np.ndarray:
    """Full audio front end on device: grids in, ``(M, T, n_bands)`` MSO out.

    Drop-in for ops/mso.py::mso_batch_from_hvo when a real accelerator is
    attached — per chunk, only the HVO grids (221 KB) cross the host↔device
    link and only the (chunk, T, 16) MSO comes back. All chunks are dispatched
    asynchronously up front (the rendered waveforms never leave the device),
    so dispatch latency pipelines away. ``chunk_size`` is capped at 64 by the
    synth kernel's SMEM event budget.
    """
    from .mso import MSOParams, mso_waveform_length

    params = params or MSOParams()
    chunk_size = min(chunk_size, 64)
    hvos = np.asarray(hvos, np.float32)
    m, t = hvos.shape[0], hvos.shape[1]
    if m == 0:
        return np.zeros((0, t, params.n_bands), np.float32)
    qpms = np.asarray(qpms, np.float64)
    sfs = list(soundfonts) if soundfonts is not None else [None] * m

    table, base, luts, sf_index = pack_tables(sfs, params.sr)
    sf_base = np.asarray([base[sf] for sf in sfs], np.int32)
    sf_k = np.asarray([sf_index[sf] for sf in sfs], np.int32)
    min_sps = float((qpms.min() / 60.0) * 4.0)
    length = mso_waveform_length(t, min_sps, params)
    sps = ((qpms / 60.0) * 4.0).astype(np.float32)

    pending = []
    for start in range(0, m, chunk_size):
        end = min(start + chunk_size, m)
        pad = chunk_size - (end - start)  # fixed shapes → one compilation
        chunk = np.pad(hvos[start:end], ((0, pad), (0, 0), (0, 0)))
        dev = _front_end(
            jnp.asarray(chunk),
            jnp.asarray(np.pad(sps[start:end], (0, pad), constant_values=1.0)),
            table,
            jnp.asarray(np.pad(sf_base[start:end], (0, pad))),
            length, t, params,
            luts, jnp.asarray(np.pad(sf_k[start:end], (0, pad))))
        pending.append((slice(start, end), dev, end - start))

    out = np.zeros((m, t, params.n_bands), np.float32)
    for sl, dev, keep in pending:
        out[sl] = np.asarray(dev)[:keep]
    return out
