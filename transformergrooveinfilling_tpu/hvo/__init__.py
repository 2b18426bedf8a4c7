"""HVO (hits / velocities / offsets) core representation.

The single most important data contract in the framework (SURVEY.md §0.2): a drum
loop is a ``(T, 3*V)`` float matrix with ``T = 32`` 16th-note steps and ``V = 9``
drum voices. Columns ``[0:V]`` are binary hits, ``[V:2V]`` velocities in [0, 1],
``[2V:3V]`` timing offsets in fractional-gridstep units (≈ [-0.5, 0.5]).
"""

from .mapping import (
    ROLAND_REDUCED_MAPPING,
    N_VOICES,
    VOICE_NAMES,
    midi_note_to_voice,
)
from .sequence import HVOSequence, TimeSignature, Tempo, Metadata, empty_like
from . import ops

__all__ = [
    "ROLAND_REDUCED_MAPPING",
    "N_VOICES",
    "VOICE_NAMES",
    "midi_note_to_voice",
    "HVOSequence",
    "TimeSignature",
    "Tempo",
    "Metadata",
    "empty_like",
    "ops",
]
