"""Unpickling shims for reference-era artifacts.

The reference's dataset/evaluator pickles reference classes from modules that do
not exist here (``hvo_sequence.*``, ``dataset``, ``evaluator``; the reference even
pins ``__module__`` into its pickles, /root/reference/dataset.py:57-58). This
module provides a renaming Unpickler that resolves those class paths to tolerant
stand-ins, plus converters into our native types — delivering SURVEY.md §7.3.3
(pickle compat) without importing any reference code.

torch tensors inside legacy pickles are converted to numpy on sight.
"""

from __future__ import annotations

import io
import pickle

import numpy as np

from ..hvo import HVOSequence
from ..hvo.sequence import Metadata, Tempo, TimeSignature


class _LegacyObject:
    """Absorbs any pickled state; attribute access mirrors the original."""

    def __setstate__(self, state):
        if isinstance(state, dict):
            self.__dict__.update(state)
        else:
            self.__dict__["_state"] = state


class _LegacyUnpickler(pickle.Unpickler):
    _SHIMS = {
        "HVO_Sequence": _LegacyObject,
        "Time_Signature": _LegacyObject,
        "Tempo": _LegacyObject,
        "Metadata": _LegacyObject,
    }

    def find_class(self, module, name):
        if name in self._SHIMS and (
            module.startswith("hvo_sequence") or module in ("dataset", "evaluator")
        ):
            return self._SHIMS[name]
        if module.startswith(("dataset", "evaluator", "GrooveEvaluator",
                              "BaseGrooveTransformers", "preprocessed_dataset")):
            return _LegacyObject
        if module.startswith("torch") and name in ("Tensor", "_rebuild_tensor_v2"):
            # torch handles its own rebuild; fall through to real torch
            pass
        return super().find_class(module, name)


def legacy_load(path_or_bytes):
    if isinstance(path_or_bytes, (bytes, bytearray)):
        return _LegacyUnpickler(io.BytesIO(path_or_bytes)).load()
    with open(path_or_bytes, "rb") as f:
        return _LegacyUnpickler(f).load()


def _to_numpy(x):
    if hasattr(x, "detach"):  # torch tensor
        return x.detach().cpu().numpy()
    return np.asarray(x)


def to_native(obj) -> HVOSequence:
    """Convert a legacy HVO_Sequence-shaped object to :class:`HVOSequence`."""
    if isinstance(obj, HVOSequence):
        return obj
    d = getattr(obj, "__dict__", {})
    hvo = _to_numpy(d.get("hvo", d.get("_hvo", np.zeros((32, 27)))))

    def _meta_get(key, default=""):
        meta = d.get("metadata") or d.get("_metadata")
        if meta is None:
            return d.get(key, default)
        if isinstance(meta, dict):
            return meta.get(key, default)
        return getattr(meta, key, getattr(meta, "_" + key, default))

    metadata = Metadata(
        drummer=str(_meta_get("drummer")),
        session=str(_meta_get("session")),
        master_id=str(_meta_get("master_id")),
        style_primary=str(_meta_get("style_primary")),
        style_secondary=str(_meta_get("style_secondary")),
        beat_type=str(_meta_get("beat_type")),
        loop_id=str(_meta_get("loop_id")),
        bpm=float(_meta_get("bpm", 0.0) or 0.0),
    )

    ts_raw = d.get("time_signatures") or d.get("_time_signatures") or [None]
    signatures = []
    for ts in ts_raw:
        td = getattr(ts, "__dict__", {}) if ts is not None else {}
        signatures.append(
            TimeSignature(
                time_step=int(td.get("time_step", td.get("_time_step", 0)) or 0),
                numerator=int(td.get("numerator", td.get("_numerator", 4)) or 4),
                denominator=int(td.get("denominator", td.get("_denominator", 4)) or 4),
            )
        )

    tempo_raw = d.get("tempos") or d.get("_tempos") or [None]
    tempos = []
    for tp in tempo_raw:
        td = getattr(tp, "__dict__", {}) if tp is not None else {}
        tempos.append(Tempo(qpm=float(td.get("qpm", td.get("_qpm", 120.0)) or 120.0)))

    return HVOSequence(
        hvo=np.asarray(hvo, dtype=np.float64),
        time_signatures=signatures or [TimeSignature()],
        tempos=tempos or [Tempo()],
        metadata=metadata,
    )
