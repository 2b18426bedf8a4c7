"""Data layer: corpus subsetting (L2) and infilling task datasets (L3)."""

from .samplers import (
    get_voice_combinations,
    get_voice_idx_for_item,
    get_sf_v_combinations,
    get_sf_list,
)
from .datasets import (
    GrooveMidiDatasetInfilling,
    GrooveMidiDatasetInfillingSymbolic,
    GrooveMidiDatasetInfillingRandom,
    load_processed_dataset,
    dataset_class_for_experiment,
)
from .subsetter import GrooveMidiSubsetter
from .synthetic import synthetic_gmd_sequences

__all__ = [
    "get_voice_combinations",
    "get_voice_idx_for_item",
    "get_sf_v_combinations",
    "get_sf_list",
    "GrooveMidiDatasetInfilling",
    "GrooveMidiDatasetInfillingSymbolic",
    "GrooveMidiDatasetInfillingRandom",
    "load_processed_dataset",
    "dataset_class_for_experiment",
    "GrooveMidiSubsetter",
    "synthetic_gmd_sequences",
]
