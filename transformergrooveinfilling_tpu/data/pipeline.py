"""Streaming augmentation pipeline: preprocessing overlapped with training.

The reference bakes a fixed set of augmented items into its dataset pickles
because per-item CPU preprocessing is expensive (tutorial.py:25). Here the
augmentation pass is vectorized and cheap enough to *regenerate every epoch* in
a background thread while the device trains on the previous generation — fresh
random maskings (and, for the audio modality, fresh synth+MSO renders) each
epoch with zero training-loop stalls (BASELINE.md: "preprocessing fully
overlapped").

Double-buffered: one generation being consumed on device, the next being built
on host. ``next_epoch()`` blocks only if the producer has fallen behind.
"""

from __future__ import annotations

import queue
import threading

import numpy as np

from ..hvo import N_VOICES


class StreamingAugmenter:
    """Per-epoch regenerated random-masking augmentation.

    Args:
        base_hvos: ``(M, T, 3V)`` clean source grids (the corpus).
        qpms: ``(M,)`` tempos (audio modality only).
        aug_per_item: augmentation fan-out per epoch (dataset size = M × fanout).
        mode: "symbolic" (inputs = masked HVO) or "audio" (inputs = MSO).
        thres_range: remove_random_events threshold range.
        soundfonts: optional list to sample per render (audio mode).
        seed: generation RNG seed (generation i uses seed + i).
    """

    def __init__(self, base_hvos: np.ndarray, qpms=None, aug_per_item: int = 4,
                 mode: str = "symbolic", thres_range=(0.4, 0.6),
                 soundfonts=None, seed: int = 0, mso_params=None):
        assert mode in ("symbolic", "audio")
        self.base = np.asarray(base_hvos, np.float32)
        self.qpms = (np.asarray(qpms, np.float64) if qpms is not None
                     else np.full((len(self.base),), 120.0))
        self.aug_per_item = aug_per_item
        self.mode = mode
        self.thres_range = thres_range
        self.soundfonts = list(soundfonts) if soundfonts else [None]
        self.seed = seed
        self.mso_params = mso_params
        self._generation = 0
        self._queue: queue.Queue = queue.Queue(maxsize=1)
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._producer, daemon=True)
        self._thread.start()

    @property
    def n_samples(self) -> int:
        return len(self.base) * self.aug_per_item

    def _build_generation(self, gen: int):
        rng = np.random.default_rng(self.seed + gen)
        m = len(self.base)
        stacked = np.repeat(self.base, self.aug_per_item, axis=0)
        qpms = np.repeat(self.qpms, self.aug_per_item, axis=0)
        n = len(stacked)
        thres = rng.uniform(*self.thres_range, (n, 1, 1))
        h = stacked[:, :, :N_VOICES]
        remove = (rng.random(h.shape) < thres) & (h > 0)
        remove3 = np.concatenate([remove] * 3, axis=2)
        kept = np.where(remove3, 0.0, stacked)
        removed = np.where(remove3, stacked, 0.0)

        if self.mode == "symbolic":
            inputs = kept
        else:
            from ..ops.mso import MSOParams, mso_batch_from_hvo

            sfs = [self.soundfonts[i] for i in
                   rng.integers(0, len(self.soundfonts), n)]
            params = self.mso_params or MSOParams()
            # build in slabs and poll the stop flag between them, so close()
            # never has to kill a thread mid-device-call (the front end itself
            # chunks further and pipelines device dispatch internally)
            slab = 2048
            inputs = np.zeros((n, kept.shape[1], params.n_bands), np.float32)
            for s in range(0, n, slab):
                if self._stop.is_set():
                    break
                e = min(s + slab, n)
                inputs[s:e] = mso_batch_from_hvo(
                    kept[s:e], sfs[s:e], qpms[s:e], params=params)
        # copy=False: both arrays are already float32 — a plain astype would
        # duplicate hundreds of MB per generation at 10k-item scale
        return (inputs.astype(np.float32, copy=False),
                removed.astype(np.float32, copy=False))

    def _producer(self):
        gen = 0
        try:
            while not self._stop.is_set():
                arrays = self._build_generation(gen)
                while not self._stop.is_set():
                    try:
                        self._queue.put((gen, arrays), timeout=0.25)
                        break
                    except queue.Full:
                        continue
                gen += 1
        except BaseException as e:  # surface in next_epoch, don't die silently
            self._producer_error = e

    def next_epoch(self, timeout: float = 300.0):
        """→ (inputs, outputs) for the next generation; normally returns
        instantly (the producer runs one generation ahead)."""
        try:
            gen, arrays = self._queue.get(timeout=timeout)
        except queue.Empty:
            err = getattr(self, "_producer_error", None)
            if err is not None:
                raise RuntimeError(
                    "streaming producer thread failed") from err
            raise TimeoutError(
                f"streaming producer produced nothing within {timeout}s "
                "(first audio generations can be slow on CPU — raise the "
                "timeout or shrink the corpus)") from None
        self._generation = gen
        return arrays

    def close(self):
        self._stop.set()
        try:
            self._queue.get_nowait()
        except queue.Empty:
            pass
        # the producer polls the stop flag between build slabs and put
        # attempts, so this join completes within one slab's build time
        self._thread.join(timeout=60.0)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
        return False
