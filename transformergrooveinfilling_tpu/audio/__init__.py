"""Host-side audio synthesis (L0).

The reference synthesizes loops with fluidsynth (C, via pyFluidSynth) — its only
native dependency with real work in it (SURVEY.md §2.3). Here synthesis is a
host-side sample-accumulation engine with two sample sources: a procedural
drum-kit (hermetic default; no assets needed) and a SoundFont (.sf2) parser. The
hot mixing loop has a C++ implementation (audio/native) with a numpy fallback.
"""

from .synth import synthesize_hvo, synthesize_hvo_batch, write_wav, read_wav

__all__ = ["synthesize_hvo", "synthesize_hvo_batch", "write_wav", "read_wav"]
