"""Golden-snapshot tests for the SVG/HTML media renderers.

The media surface (piano rolls, velocity heatmaps, tabbed layout, feature
PDFs — eval/media.py, the stack's replacement for the reference's bokeh
figures, /root/reference/evaluator.py:323-362) is pinned byte-for-byte against
checked-in snapshots so refactors can't silently change renders.

Nondeterminism is confined to the uuid tab-group token in ``tabs_html``;
snapshots are compared after normalizing it. Regenerate intentionally with:

    TGI_UPDATE_GOLDENS=1 python -m pytest tests/test_media_golden.py
"""

import os
import pathlib
import re
import types

import numpy as np
import pytest

from transformergrooveinfilling_tpu.eval import media

GOLDEN_DIR = pathlib.Path(__file__).parent / "data" / "golden_media"
UPDATE = bool(os.environ.get("TGI_UPDATE_GOLDENS"))

_GROUP_RE = re.compile(r'name="tabs-([0-9a-f]{8})"')


def _normalize(text: str) -> str:
    """Replace every per-render uuid tab-group token with a stable marker."""
    for i, token in enumerate(dict.fromkeys(_GROUP_RE.findall(text))):
        text = text.replace(token, f"GROUP{i}")
    return text


def _check(name: str, rendered: str) -> None:
    rendered = _normalize(rendered)
    path = GOLDEN_DIR / f"{name}.html"
    if UPDATE:
        GOLDEN_DIR.mkdir(parents=True, exist_ok=True)
        path.write_text(rendered)
        return
    assert path.exists(), (
        f"missing golden {path}; run TGI_UPDATE_GOLDENS=1 pytest "
        f"tests/test_media_golden.py to create it")
    assert rendered == path.read_text(), (
        f"media render for {name!r} changed; if intentional regenerate with "
        f"TGI_UPDATE_GOLDENS=1")


def _seq(seed: int, t: int = 32, voices: int = 9):
    """Deterministic stand-in sequence: .hvo (T, 3V) with sparse hits."""
    rng = np.random.default_rng(seed)
    hits = (rng.random((t, voices)) < 0.3).astype(np.float32)
    vels = rng.random((t, voices)).astype(np.float32) * hits
    offs = (rng.random((t, voices)).astype(np.float32) - 0.5) * hits
    return types.SimpleNamespace(hvo=np.concatenate([hits, vels, offs], 1))


def test_piano_roll_golden():
    _check("piano_roll", media.piano_roll_html(_seq(0), title="golden roll"))


def test_velocity_heatmap_golden_horizontal():
    subsets = {"funk": [_seq(1), _seq(2)], "rock": [_seq(3)], "empty": []}
    _check("velocity_heatmap_h",
           media.velocity_heatmap_html(subsets, "golden", horizontal=True))


def test_velocity_heatmap_golden_vertical():
    subsets = {"funk": [_seq(1), _seq(2)], "rock": [_seq(3)]}
    _check("velocity_heatmap_v",
           media.velocity_heatmap_html(subsets, "golden", horizontal=False))


def test_tabs_golden():
    _check("tabs", media.tabs_html(["<p>one</p>", "<p>two</p>"], ["A", "B"]))


def test_histogram_golden():
    rng = np.random.default_rng(7)
    _check("histogram", media._histogram_svg(rng.normal(size=200), "hist"))
    # empty input renders the frame only, not a crash
    _check("histogram_empty", media._histogram_svg([], "empty hist"))


def test_feature_pdf_golden():
    subsets = {"funk": [_seq(1), _seq(2)], "rock": [_seq(3)]}
    _check("feature_pdf", media.feature_pdf_html(subsets, "golden"))


def test_html_document_golden():
    _check("document", media.html_document("<p>body</p>", title="t"))
