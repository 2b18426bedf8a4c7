"""Voice-combination / soundfont augmentation samplers.

Behavioral re-implementation of /root/reference/utils.py:53-149. These run on the
host at dataset-construction time (metadata-scale work); the array-heavy masking
they plan is executed vectorized afterwards. Sampling deliberately keeps the
reference's semantics — weighted ``choices`` *with replacement* (duplicates
possible, SURVEY.md §7.3.6) — but draws from an explicit ``random.Random``
instance so dataset builds are reproducible from a seed.
"""

from __future__ import annotations

import itertools
import os
import random as _random
from copy import deepcopy

import numpy as np


def get_sf_list(sf_path):
    """Expand a soundfont spec (single .sf2 / directory / list / None) to a list.

    Reference utils.py:20-35 (its missing-slash join bug is fixed: we use
    os.path.join per entry). ``None`` maps to the built-in procedural kit.
    """
    if sf_path is None:
        return [None]
    if isinstance(sf_path, (list, tuple)):
        return list(sf_path)
    if str(sf_path).endswith(".sf2"):
        return [sf_path]
    if os.path.isdir(sf_path):
        return sorted(
            os.path.join(sf_path, sf)
            for sf in os.listdir(sf_path)
            if sf.endswith(".sf2")
        )
    return [sf_path]


def get_voice_idx_for_item(hvo_seq, voices_params: dict):
    """Drop voices absent from the item from the removal candidates
    (reference utils.py:53-66); returns (voice_idx, updated_params).

    Deviation: the reference truncates ``prob`` to ``len(voice_idx)`` while
    its own sampler asserts ``len(prob) == len(range(min_n, max_n+1))`` — a
    sparse item with ``min_n_voices_to_remove > 1`` then crashes the whole
    dataset build (utils.py:65 vs :98-101). Here ``prob`` is truncated to
    the number of combination *sizes* actually available, which is what the
    weights mean."""
    active = set(np.asarray(hvo_seq.get_active_voices()).tolist())
    voice_idx = [v for v in voices_params["voice_idx"] if v in active]
    params = deepcopy(voices_params)
    params["voice_idx"] = voice_idx
    min_n = params.get("min_n_voices_to_remove", 1)
    max_n = min(params.get("max_n_voices_to_remove", 3), len(voice_idx))
    params["prob"] = params["prob"][: max(0, max_n - min_n + 1)]
    return voice_idx, params


def get_voice_combinations(
    voice_idx=(0, 1, 2, 3, 4),
    min_n_voices_to_remove: int = 1,
    max_n_voices_to_remove: int = 3,
    prob=(1, 1, 1),
    k: int | None = 5,
    rng: _random.Random | None = None,
    **_ignored,
):
    """k weighted samples (with replacement) from all removal combinations of
    size min..max; k=None returns every combination (reference utils.py:69-115)."""
    rng = rng or _random
    voice_idx = list(voice_idx)
    max_n = min(max_n_voices_to_remove, len(voice_idx))
    if max_n < min_n_voices_to_remove:
        # too few active voices to form any removal set: no combinations
        # (the dataset marks such items unused) — the reference asserts and
        # aborts the whole build here instead
        return []
    sizes = range(min_n_voices_to_remove, max_n + 1)
    prob = list(prob)
    assert len(prob) == len(list(sizes)), (
        "prob list must match range(min_n_voices_to_remove, max_n_voices_to_remove)"
    )

    combos, weights = [], []
    for i, n in enumerate(sizes):
        new = list(itertools.combinations(voice_idx, n))
        combos.extend(new)
        weights.extend([prob[i]] * len(new))

    if k is None:
        return combos
    return rng.choices(combos, weights=weights, k=k)


def get_sf_v_combinations(
    voices_parameters: dict,
    max_aug_items: int,
    max_n_sf: int | None,
    sfs_list,
    rng: _random.Random | None = None,
):
    """Product of sampled soundfonts × voice combos, capped at ``max_aug_items``
    (reference utils.py:118-149)."""
    rng = rng or _random
    if len(voices_parameters["voice_idx"]) == 1:
        v_comb = [tuple(voices_parameters["voice_idx"])]
    else:
        v_comb = get_voice_combinations(rng=rng, **voices_parameters)

    sfs = rng.choices(sfs_list, k=max_n_sf) if max_n_sf is not None else list(sfs_list)

    sf_v_comb = list(itertools.product(sfs, v_comb))
    if len(sf_v_comb) > max_aug_items:
        sf_v_comb = rng.choices(sf_v_comb, k=max_aug_items)
    return sf_v_comb
