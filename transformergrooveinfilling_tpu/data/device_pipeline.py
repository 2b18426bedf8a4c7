"""Augmentation fused into the compiled training program.

data/pipeline.py's StreamingAugmenter builds generations on the host and
swaps arrays per block — preprocessing overlapped with training. This module
goes one step further, the fully TPU-native design: the random masking (and,
for the audio modality, the synthesis + MSO front end) runs *inside* the
jitted epoch as ``augment`` hooks (train/loop.py::make_epoch_fn). The clean
base grids live on device once; every epoch (or block) trains on a fresh
masking/render with zero host work and zero host↔device transfer.

Semantics mirror the reference's random-masking dataset
(/root/reference/dataset.py:464-555 / hvo_seq.remove_random_events): one
per-item removal threshold drawn from ``thres_range``, hits removed i.i.d.
below it, inputs = kept part (or its MSO), targets = removed part.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..hvo.ops import remove_random_events_batch


def random_mask_on_device(key, base, thres_range=(0.4, 0.6)):
    """``(M, T, 3V)`` clean grids → (kept, removed), fresh per call.

    Thin batched wrapper over the single reference-parity implementation
    (hvo/ops.py::remove_random_events: per-item threshold from
    ``thres_range``, active hits removed i.i.d. below it)."""
    keys = jax.random.split(key, base.shape[0])
    return remove_random_events_batch(base, keys, thres_range)


def make_on_device_augment(qpms=None, mode: str = "symbolic",
                           thres_range=(0.4, 0.6), soundfonts=None,
                           mso_params=None, chunk: int = 64,
                           seed: int = 0):
    """Build a jittable ``(key, base_in, base_out) -> (inputs, outputs)`` hook.

    ``mode="symbolic"``: inputs are the kept grids. ``mode="audio"``: the
    kept grids render through the on-device synthesizer and MSO DSP
    (ops/device_synth.py), mapped in ``chunk``-item slices via ``lax.map``
    (the Pallas synth kernel's SMEM event budget caps one call at 64 items) —
    the base count must be a multiple of ``chunk``. Per-item soundfonts are
    assigned once (seeded) and stay fixed across epochs; the masking is what
    regenerates. Pass the epoch fn the clean grids as BOTH inputs and
    outputs.
    """
    assert mode in ("symbolic", "audio")
    # the Pallas synth kernel's SMEM scalar-prefetch budget caps one call at
    # 64 items (ops/device_synth.py enforces the same bound on its own path)
    chunk = min(chunk, 64)
    if mode == "symbolic":
        def augment(key, base_in, base_out):
            del base_out  # both args are the same clean grids
            return random_mask_on_device(key, base_in, thres_range)

        return augment

    from ..ops.device_synth import pack_tables, synthesize_on_device
    from ..ops.mso import MSOParams, mso_batch, mso_waveform_length

    params = mso_params or MSOParams()
    sfs = list(soundfonts) if soundfonts else [None]
    table, base_map, luts, sf_index = pack_tables(sfs, params.sr)
    qpms = np.asarray(qpms if qpms is not None else [120.0], np.float64)

    def augment(key, base_in, base_out):
        del base_out
        m, t = base_in.shape[0], base_in.shape[1]
        assert m % chunk == 0, (
            f"audio on-device augmentation needs the base count ({m}) to be "
            f"a multiple of chunk ({chunk}); repeat or trim the corpus")
        # a leading-window slice of the corpus (e.g. the watch-histogram
        # batch) augments with its own items' tempos
        q = (np.broadcast_to(qpms, (m,)) if qpms.size == 1
             else np.asarray(qpms)[:m])
        assert q.shape[0] == m, (
            f"{m} items but only {qpms.size} per-item tempos")
        sps = jnp.asarray((q / 60.0) * 4.0, jnp.float32)
        length = mso_waveform_length(t, float((q.min() / 60.0) * 4.0), params)
        rng = np.random.default_rng(seed)
        item_sf = rng.integers(0, len(sfs), m)
        sf_rows = jnp.asarray([base_map[sfs[i]] for i in item_sf], jnp.int32)
        sf_ks = jnp.asarray([sf_index[sfs[i]] for i in item_sf], jnp.int32)

        kept, removed = random_mask_on_device(key, base_in, thres_range)

        def chunk_fn(args):
            grids, sps_c, rows_c, ks_c = args
            waves = synthesize_on_device(grids, sps_c, table, rows_c, length,
                                         luts=luts, sf_k=ks_c)
            return mso_batch(waves, sps_c, t, params)

        n_chunks = m // chunk
        mso = jax.lax.map(chunk_fn, (
            kept.reshape(n_chunks, chunk, t, base_in.shape[2]),
            sps.reshape(n_chunks, chunk),
            sf_rows.reshape(n_chunks, chunk),
            sf_ks.reshape(n_chunks, chunk)))
        return mso.reshape(m, t, params.n_bands), removed

    return augment
