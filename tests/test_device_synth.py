"""On-device synthesis: event extraction, Pallas kernel parity, routing.

The device front end must reproduce the host C++/numpy mixer bit-for-bit
(same truncation, same sample placement) so the audio datasets are identical
whichever route built them (reference contract: dataset.py:256's MSO inputs).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from transformergrooveinfilling_tpu.audio.synth import synthesize_hvo_batch
from transformergrooveinfilling_tpu.data.synthetic import synthetic_gmd_sequences
from transformergrooveinfilling_tpu.ops.device_synth import (
    _extract_events,
    _synth_pallas,
    _synth_scan,
    mso_batch_from_hvo_device,
    pack_tables,
    synthesize_on_device,
)
from transformergrooveinfilling_tpu.ops.mso import (
    MSOParams,
    mso_batch_from_hvo,
    mso_waveform_length,
)


def _corpus(n=8, seed=7):
    seqs = synthetic_gmd_sequences(n, seed=seed)
    return np.stack([s.hvo for s in seqs]).astype(np.float32)


def test_device_synth_matches_host_mixer():
    hvos = _corpus()
    qpms = np.full((8,), 120.0)
    L = 40000
    w_host = synthesize_hvo_batch(hvos, qpms, [None] * 8, fixed_length=L)
    table, base, _luts, _k = pack_tables([None], 44100)
    w_dev = np.asarray(synthesize_on_device(
        jnp.asarray(hvos), jnp.full((8,), 8.0, jnp.float32), table,
        jnp.zeros(8, jnp.int32), L))
    # host applies per-item clipping normalization (one loud loop must not
    # rescale its batchmates); mirror it here
    peak = np.max(np.abs(w_dev), axis=-1, keepdims=True, initial=1e-9)
    w_dev = np.divide(w_dev, peak, where=peak > 1.0,
                      out=w_dev.astype(np.float32))
    np.testing.assert_allclose(w_host, w_dev, atol=1e-6)


def test_pallas_kernel_matches_scan_interpret():
    """The VMEM event kernel (lane rotation + row spill) against the XLA scan
    on random events, in interpreter mode."""
    rng = np.random.default_rng(0)
    m, t, v = 4, 32, 9
    h = (rng.random((m, t, v)) < 0.25).astype(np.float32)
    hvo = np.concatenate(
        [h, h * rng.random((m, t, v)),
         (rng.random((m, t, v)) - 0.5) * h], axis=2).astype(np.float32)
    table = jnp.asarray(rng.standard_normal((18, 256)).astype(np.float32))
    sps = jnp.full((m,), 8.0, jnp.float32)
    sfb = jnp.asarray([0, 9, 0, 9], jnp.int32)
    L = 2000
    onset, row, vel = _extract_events(jnp.asarray(hvo), sps, sfb, L, 44100.0)
    onset = onset % (L - 1)  # tiny L: keep onsets in range
    y_scan = np.asarray(_synth_scan(onset, row, vel, table, L))
    y_pal = np.asarray(_synth_pallas(onset, row, vel, table, L,
                                     interpret=True))
    np.testing.assert_allclose(y_scan, y_pal, atol=1e-5)


def test_mso_device_route_matches_host_route():
    hvos = _corpus()
    qpms = np.full((8,), 120.0)
    host = mso_batch_from_hvo(hvos, [None] * 8, qpms, device_synth=False)
    dev = mso_batch_from_hvo(hvos, [None] * 8, qpms, device_synth=True)
    scale = np.max(np.abs(host)) + 1e-9
    np.testing.assert_allclose(host, dev, atol=2e-5 * scale, rtol=1e-3)


def test_pack_tables_cached_and_aligned():
    t1, b1, l1, k1 = pack_tables([None], 44100)
    t2, b2, l2, k2 = pack_tables([None], 44100)
    assert t1 is t2 and b1 is b2 and l1 is l2  # cache hit: no rebuild, no re-transfer
    assert t1.shape[1] % 128 == 0  # lane alignment for the Pallas kernel
    assert t1.shape[0] == 9


def test_multi_soundfont_base_offsets():
    """Two distinct kits in one batch: each item must hit its own table."""
    rng = np.random.default_rng(1)
    table = jnp.asarray(
        np.concatenate([np.ones((9, 128)), 2 * np.ones((9, 128))]).astype(
            np.float32))
    hvo = np.zeros((2, 32, 27), np.float32)
    hvo[:, 0, 0] = 1.0   # kick hit at step 0
    hvo[:, 0, 9] = 1.0   # velocity 1
    sps = jnp.full((2,), 8.0, jnp.float32)
    L = 1000
    onset, row, vel = _extract_events(
        jnp.asarray(hvo), sps, jnp.asarray([0, 9], jnp.int32), L, 44100.0)
    y = np.asarray(_synth_scan(onset, row, vel, table, L))
    assert y[0, 0] == 1.0 and y[1, 0] == 2.0


def test_waveform_length_covers_grid_and_flux_margin():
    p = MSOParams()
    L = mso_waveform_length(32, 8.0, p)
    grid_frames = int(np.ceil(31.5 / 8.0 * p.sr / p.hop_length))
    n_frames = 1 + (L + 2 * (p.n_fft // 2) - p.win_length) // p.hop_length
    assert n_frames >= grid_frames + p.mean_filter_size
    assert L < int(np.ceil(32 / 8.0 * p.sr)) + 2 * p.sr  # strictly cheaper


def test_device_route_with_sf2_and_mixed_kits(tmp_path):
    """Per-item soundfonts through the on-device path: a written .sf2 kit and
    the procedural kit in one batch, each item hitting its own table rows —
    must match the host mixer route item for item."""
    from transformergrooveinfilling_tpu.audio.drumkit import default_kit
    from transformergrooveinfilling_tpu.audio.sf2 import write_minimal_sf2
    from transformergrooveinfilling_tpu.hvo.mapping import VOICE_TO_MIDI_NOTE

    sr = 44100
    kit = default_kit(sr)
    # a deliberately different-sounding kit: halved amplitude
    samples = {key: 0.5 * kit[v] for v, key in enumerate(VOICE_TO_MIDI_NOTE)}
    sf_path = str(tmp_path / "half.sf2")
    write_minimal_sf2(sf_path, samples, sr=sr)

    hvos = _corpus(4)
    qpms = np.full((4,), 120.0)
    sfs = [None, sf_path, None, sf_path]
    dev = mso_batch_from_hvo(hvos, sfs, qpms, device_synth=True)
    host = mso_batch_from_hvo(hvos, sfs, qpms, device_synth=False)
    scale = np.max(np.abs(host)) + 1e-9
    np.testing.assert_allclose(dev, host, atol=6e-3 * scale)
    # the two kits genuinely differ (different rows were used)
    assert not np.allclose(dev[0], dev[1], atol=1e-3)
