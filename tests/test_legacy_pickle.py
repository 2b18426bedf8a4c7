"""Legacy-pickle compatibility (SURVEY.md §7.3.3).

Reference-era artifacts pickle classes from modules that do not exist here
(``hvo_sequence.hvo_seq.HVO_Sequence``, ``dataset.GrooveMidiDatasetInfilling``
with ``__module__`` pinned to "dataset"). These tests forge those module paths,
pickle reference-shaped objects (torch tensors included), and assert our shims
load and convert them.
"""

import pickle
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from transformergrooveinfilling_tpu.data.legacy_pickle import (
    legacy_load,
    to_native,
)
from transformergrooveinfilling_tpu.data.datasets import (
    _normalize_legacy_processed,
)
from transformergrooveinfilling_tpu.hvo import HVOSequence


def _forge_reference_modules():
    """Install fake hvo_sequence modules shaped like the reference's."""
    pkg = types.ModuleType("hvo_sequence")
    sub = types.ModuleType("hvo_sequence.hvo_seq")

    class Metadata:
        def __init__(self, **kw):
            self.__dict__.update(kw)

    class Time_Signature:
        def __init__(self, time_step=0, numerator=4, denominator=4):
            self.time_step = time_step
            self.numerator = numerator
            self.denominator = denominator

    class Tempo:
        def __init__(self, time_step=0, qpm=120.0):
            self.time_step = time_step
            self.qpm = qpm

    class HVO_Sequence:
        def __init__(self, hvo, style="funk", master_id="d1/s1/0", bpm=95.0):
            self.hvo = hvo
            self.time_signatures = [Time_Signature()]
            self.tempos = [Tempo(qpm=bpm)]
            self.metadata = Metadata(
                drummer="d1", session="s1", master_id=master_id,
                style_primary=style, style_secondary="", beat_type="beat",
                loop_id="0", bpm=bpm)

    for cls in (Metadata, Time_Signature, Tempo, HVO_Sequence):
        cls.__module__ = "hvo_sequence.hvo_seq"
        cls.__qualname__ = cls.__name__  # make locally-defined classes picklable
        setattr(sub, cls.__name__, cls)
        setattr(pkg, cls.__name__, cls)
    sys.modules["hvo_sequence"] = pkg
    sys.modules["hvo_sequence.hvo_seq"] = sub
    return HVO_Sequence


@pytest.fixture
def forged(request):
    cls = _forge_reference_modules()

    def cleanup():
        sys.modules.pop("hvo_sequence", None)
        sys.modules.pop("hvo_sequence.hvo_seq", None)

    request.addfinalizer(cleanup)
    return cls


def test_legacy_hvo_sequence_pickle(forged, rng, tmp_path):
    HVO_Sequence = forged
    hvo = rng.random((32, 27))
    seqs = [HVO_Sequence(hvo, style="latin", bpm=101.0)]
    blob = pickle.dumps(seqs)

    # forged modules removed → plain pickle.loads would fail
    sys.modules.pop("hvo_sequence", None)
    sys.modules.pop("hvo_sequence.hvo_seq", None)
    with pytest.raises(Exception):
        pickle.loads(blob)

    loaded = legacy_load(blob)
    native = to_native(loaded[0])
    assert isinstance(native, HVOSequence)
    np.testing.assert_allclose(native.hvo, hvo)
    assert native.metadata.style_primary == "latin"
    assert native.metadata.bpm == 101.0
    assert str(native.time_signatures[0]) == "4-4"


def test_legacy_processed_dict_with_torch_tensors(forged, rng):
    """A reference dataset pickle: torch tensors + legacy HVO objects."""
    HVO_Sequence = forged
    processed = {
        "processed_inputs": torch.rand(4, 32, 16),
        "processed_outputs": torch.rand(4, 32, 27),
        "hvo_sequences": [HVO_Sequence(rng.random((32, 27)))],
        "hvo_sequences_inputs": [HVO_Sequence(rng.random((32, 27)))],
        "hvo_sequences_outputs": [HVO_Sequence(rng.random((32, 27)))],
        "hvo_index": [0],
        "voices_reduced": [[2]],
        "soundfonts": ["kit.sf2"],
        "unused_items": [],
    }
    blob = pickle.dumps(processed)
    sys.modules.pop("hvo_sequence", None)
    sys.modules.pop("hvo_sequence.hvo_seq", None)

    loaded = legacy_load(blob)
    normalized = _normalize_legacy_processed(loaded)
    assert isinstance(normalized["processed_inputs"], np.ndarray)
    assert normalized["processed_inputs"].shape == (4, 32, 16)
    assert normalized["processed_inputs"].dtype == np.float32
    assert isinstance(normalized["hvo_sequences"][0], HVOSequence)
    assert normalized["voices_reduced"] == [[2]]


def test_subsetter_reads_legacy_tree(forged, rng, tmp_path):
    """GrooveMidiSubsetter consumes a reference-era hvo_sequence_data.obj."""
    import os

    HVO_Sequence = forged
    seqs = [HVO_Sequence(rng.random((32, 27)), style=s)
            for s in ("funk", "rock", "funk")]
    tree = tmp_path / "GrooveMIDI_processed_train"
    os.makedirs(tree)
    with open(tree / "hvo_sequence_data.obj", "wb") as f:
        pickle.dump(seqs, f)
    sys.modules.pop("hvo_sequence", None)
    sys.modules.pop("hvo_sequence.hvo_seq", None)

    from transformergrooveinfilling_tpu.data.subsetter import GrooveMidiSubsetter

    tags, subsets = GrooveMidiSubsetter(
        pickle_source_path=str(tmp_path),
        subset="GrooveMIDI_processed_train",
        list_of_filter_dicts_for_subsets=[{"style_primary": ["funk"]}],
    ).create_subsets()
    assert len(subsets[0]) == 2
    assert all(isinstance(s, HVOSequence) for s in subsets[0])


def test_legacy_pickle_with_name_mangled_private_attrs(rng, tmp_path):
    """The REAL hvo_sequence library stores state as ``self.__hvo`` etc.
    behind @property accessors, so its pickles carry name-mangled __dict__
    keys (``_HVO_Sequence__hvo``, ``_Metadata__style_primary``, ...). Those
    must convert faithfully — previously they silently became all-zero
    default sequences (which the silent-item filter then dropped, yielding
    an empty dataset with no error)."""
    import pickle

    pkg = types.ModuleType("hvo_sequence")
    sub = types.ModuleType("hvo_sequence.hvo_seq")

    class Metadata:
        def __init__(self, **kw):
            for k, v in kw.items():
                setattr(self, f"_Metadata__{k}", v)

    class Time_Signature:
        def __init__(self):
            self._Time_Signature__time_step = 0
            self._Time_Signature__numerator = 3
            self._Time_Signature__denominator = 4

    class Tempo:
        def __init__(self, qpm):
            self._Tempo__qpm = qpm

    class HVO_Sequence:
        def __init__(self, hvo):
            self._HVO_Sequence__hvo = hvo
            self._HVO_Sequence__time_signatures = [Time_Signature()]
            self._HVO_Sequence__tempos = [Tempo(97.0)]
            self._HVO_Sequence__metadata = Metadata(
                drummer="d9", session="s2", master_id="d9/s2/7",
                style_primary="latin", style_secondary="", beat_type="beat",
                loop_id="7", bpm=97.0)

    for cls in (Metadata, Time_Signature, Tempo, HVO_Sequence):
        cls.__module__ = "hvo_sequence.hvo_seq"
        cls.__qualname__ = cls.__name__
        setattr(sub, cls.__name__, cls)
        setattr(pkg, cls.__name__, cls)
    sys.modules["hvo_sequence"] = pkg
    sys.modules["hvo_sequence.hvo_seq"] = sub
    try:
        hvo = rng.random((32, 27)).astype(np.float64)
        blob = pickle.dumps([HVO_Sequence(hvo)])
    finally:
        sys.modules.pop("hvo_sequence", None)
        sys.modules.pop("hvo_sequence.hvo_seq", None)

    seqs = [to_native(o) for o in legacy_load(blob)]
    assert len(seqs) == 1
    s = seqs[0]
    np.testing.assert_allclose(s.hvo, hvo)
    assert s.hvo.sum() > 0
    assert s.metadata.style_primary == "latin"
    assert s.metadata.master_id == "d9/s2/7"
    assert s.tempos[0].qpm == 97.0
    assert (s.time_signatures[0].numerator,
            s.time_signatures[0].denominator) == (3, 4)
