"""ctypes binding for the native synthesizer core (audio/native/sf2synth.cpp).

Builds the shared object on first use (g++, cached next to the source); every
entry point has a numpy fallback in synth.py, so environments without a
compiler still work — just slower on big corpora.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "libsf2synth.so")
_lock = threading.Lock()
_lib = None


def _build() -> str:
    src = os.path.join(_NATIVE_DIR, "sf2synth.cpp")
    if not os.path.exists(_SO_PATH) or (
        os.path.getmtime(src) > os.path.getmtime(_SO_PATH)
    ):
        # compile to a per-pid temp path and rename into place: a concurrent
        # process (dataset-build workers, pytest-xdist) must never dlopen a
        # half-written .so — rename is atomic on the same filesystem
        tmp = f"{_SO_PATH}.{os.getpid()}.tmp"
        try:
            subprocess.run(
                ["g++", "-O3", "-fPIC", "-shared", "-std=c++17", "-Wall",
                 "-pthread", "-o", tmp, src],
                check=True, capture_output=True,
            )
            os.replace(tmp, _SO_PATH)
        finally:
            if os.path.exists(tmp):
                os.unlink(tmp)
    return _SO_PATH


def get_lib():
    global _lib
    with _lock:
        if _lib is None:
            lib = ctypes.CDLL(_build())
            lib.tgi_mix_events.restype = None
            lib.tgi_mix_batch.restype = None
            lib.tgi_resample_linear.restype = ctypes.c_int64
            lib.tgi_biquad.restype = None
            _lib = lib
    return _lib


def _sample_table_ptrs(table):
    n = len(table)
    arrs = [np.ascontiguousarray(s, dtype=np.float32) for s in table]
    ptrs = (ctypes.POINTER(ctypes.c_float) * n)(
        *[a.ctypes.data_as(ctypes.POINTER(ctypes.c_float)) for a in arrs])
    lens = np.asarray([len(a) for a in arrs], dtype=np.int64)
    return arrs, ptrs, lens


def mix_events_native(buf: np.ndarray, table, voices: np.ndarray,
                      onsets: np.ndarray, vels: np.ndarray):
    """Drop-in replacement for synth._mix_events_numpy (same signature)."""
    lib = get_lib()
    assert buf.dtype == np.float32 and buf.flags.c_contiguous
    assert len(voices) == len(onsets) == len(vels), \
        "event arrays must be parallel (native reads len(voices) entries)"
    arrs, ptrs, lens = _sample_table_ptrs(table)
    voices = np.ascontiguousarray(voices, np.int32)
    onsets = np.ascontiguousarray(onsets, np.int64)
    vels = np.ascontiguousarray(vels, np.float32)
    lib.tgi_mix_events(
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_int64(buf.shape[0]),
        ptrs,
        lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        ctypes.c_int64(len(table)),
        voices.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        onsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        vels.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_int64(len(voices)),
    )
    del arrs  # keep alive until after the call


def mix_batch_native(bufs: np.ndarray, table, voices: np.ndarray,
                     onsets: np.ndarray, vels: np.ndarray,
                     event_offsets: np.ndarray, n_threads: int = 0):
    """Mix a whole batch in one native call.

    ``bufs``: ``(n_items, buf_len)`` C-contiguous float32, mixed in place.
    ``table``: the combined per-voice sample list (callers concatenate multiple
    soundfonts' tables and pre-offset ``voices`` into it, so one call covers a
    mixed-soundfont batch). ``event_offsets``: ``(n_items+1,)`` int64 slice
    bounds into the flat event arrays (events grouped by item, in item order).
    ``n_threads`` 0 → one thread per available CPU (items are independent).
    """
    lib = get_lib()
    assert bufs.dtype == np.float32 and bufs.flags.c_contiguous
    assert bufs.ndim == 2
    if n_threads <= 0:
        n_threads = os.cpu_count() or 1
    arrs, ptrs, lens = _sample_table_ptrs(table)
    voices = np.ascontiguousarray(voices, np.int32)
    onsets = np.ascontiguousarray(onsets, np.int64)
    vels = np.ascontiguousarray(vels, np.float32)
    event_offsets = np.ascontiguousarray(event_offsets, np.int64)
    assert event_offsets.shape == (bufs.shape[0] + 1,)
    assert len(voices) == len(onsets) == len(vels), \
        "event arrays must be parallel (native reads len(voices) entries)"
    assert event_offsets[-1] == len(voices), \
        "event_offsets[-1] must equal the flat event count"
    lib.tgi_mix_batch(
        bufs.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_int64(bufs.shape[0]),
        ctypes.c_int64(bufs.shape[1]),
        ptrs,
        lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        ctypes.c_int64(len(table)),
        voices.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        onsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        vels.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        event_offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        ctypes.c_int32(n_threads),
    )
    del arrs  # keep alive until after the call


def resample_linear(src: np.ndarray, ratio: float,
                    out_len: int | None = None) -> np.ndarray:
    """Native linear resampler; ``ratio`` = src samples per output sample."""
    lib = get_lib()
    src = np.ascontiguousarray(src, np.float32)
    if out_len is None:
        out_len = max(int((len(src) - 1) / ratio), 0)
    out = np.zeros(out_len, np.float32)
    n = lib.tgi_resample_linear(
        src.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_int64(len(src)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_int64(out_len),
        ctypes.c_double(ratio),
    )
    return out[:n]


def biquad(x: np.ndarray, b0: float, b1: float, b2: float,
           a1: float, a2: float) -> np.ndarray:
    """One direct-form-I biquad pass (coefficients normalized by a0).

    Used by the SF2 voice filter (audio/sf2.py: fluidsynth's
    initialFilterFc/Q two-pole lowpass); kept generic so other sections
    (shelf, highpass) can reuse it.
    """
    lib = get_lib()
    y = np.ascontiguousarray(x, np.float32).copy()
    lib.tgi_biquad(
        y.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_int64(len(y)),
        ctypes.c_double(b0), ctypes.c_double(b1), ctypes.c_double(b2),
        ctypes.c_double(a1), ctypes.c_double(a2),
    )
    return y
