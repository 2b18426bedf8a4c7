"""Feature families: sanity on known patterns + stats table shape."""

import numpy as np
import pytest

from transformergrooveinfilling_tpu.eval.features import (
    INFILLING_DROP_COLUMNS,
    features_table,
    lhl_syncopation,
    microtiming_features,
    statistical_features,
    syncopation_features,
)
from transformergrooveinfilling_tpu.hvo import N_VOICES


def _hvo(h, v=None, o=None):
    v = v if v is not None else h * 0.8
    o = o if o is not None else np.zeros_like(h)
    return np.concatenate([h, v, o], axis=-1)


def test_lhl_on_downbeats_is_zero():
    row = np.zeros((1, 32))
    row[0, [0, 8, 16, 24]] = 1  # quarter notes on strong positions
    assert lhl_syncopation(row)[0] == 0


def test_lhl_offbeat_syncopates():
    row = np.zeros((1, 32))
    row[0, 2] = 1  # 16th offbeat onset followed by rest on stronger position
    assert lhl_syncopation(row)[0] > 0


def test_statistical_features_basic():
    h = np.zeros((2, 32, N_VOICES), np.float32)
    h[0, ::4, 0] = 1  # kick on every beat: 8 hits
    h[1, :, 2] = 1    # hat on all 32 steps
    feats = statistical_features(_hvo(h))
    assert feats["NoI"][0] == 1 and feats["NoI"][1] == 1
    assert feats["Total Step Density"][0] == pytest.approx(8 / 32)
    assert feats["Total Step Density"][1] == 1.0
    assert feats["Lowness"][0] == 1.0 and feats["Hiness"][1] == 1.0
    assert feats["Poly Velocity Mean"][0] == pytest.approx(0.8)


def test_syncopation_family_shapes():
    h = (np.random.default_rng(0).random((5, 32, N_VOICES)) < 0.3).astype(
        np.float32)
    feats = syncopation_features(_hvo(h))
    for k, v in feats.items():
        assert v.shape == (5,), k
        assert np.isfinite(v).all(), k


def test_microtiming_swing():
    h = np.zeros((2, 32, N_VOICES), np.float32)
    h[:, ::2, 2] = 1  # 8th-note hats
    o = np.zeros_like(h)
    o[0, 2::4, 2] = 0.33  # delayed off-beat 8ths → swing
    feats = microtiming_features(_hvo(h, o=o))
    assert feats["Swingness"][0] > feats["Swingness"][1]
    assert feats["Laidbackness"][0] > 0


def test_features_table_and_drop_columns():
    rng = np.random.default_rng(1)
    h = (rng.random((6, 32, N_VOICES)) < 0.3).astype(np.float32)
    gt = _hvo(h)
    pred = _hvo((rng.random((6, 32, N_VOICES)) < 0.3).astype(np.float32))
    tags = ["funk", "funk", "rock", "rock", "jazz", "jazz"]
    df = features_table(gt, pred, tags)
    assert list(df.index) == ["funk", "jazz", "rock", "Overall"]
    assert "Statistical::NoI__Ground_Truth" in df.columns
    assert "Syncopation::Combined__Prediction" in df.columns
    # every reference drop-column name exists in our table
    for col in INFILLING_DROP_COLUMNS:
        assert col in df.columns, col


def test_get_stats_from_evaluator_csv(tmp_path):
    class FakeEval:
        pass

    rng = np.random.default_rng(2)
    ev = FakeEval()
    h = (rng.random((4, 32, N_VOICES)) < 0.3).astype(np.float32)
    ev._gt_hvos_array = _hvo(h)
    ev._prediction_hvos_array = _hvo(h)
    ev._gt_hvos_array_tags = ["funk", "funk", "rock", "rock"]
    from transformergrooveinfilling_tpu.eval.features import (
        get_stats_from_evaluator,
    )

    csv = str(tmp_path / "stats.csv")
    df = get_stats_from_evaluator(ev, csv_file=csv)
    assert (tmp_path / "stats.csv").exists()
    # GT == prediction → identical columns
    np.testing.assert_allclose(
        df["Statistical::NoI__Ground_Truth"],
        df["Statistical::NoI__Prediction"])


def test_vel_similarity_score_formula():
    """1 − velocity-MSE at GT-hit cells (VERDICT r2 directive #3): identical
    grooves score exactly 1; a uniform velocity error d at every GT-hit cell
    scores 1 − d²; velocities at non-hit cells are ignored."""
    from transformergrooveinfilling_tpu.eval.features import (
        vel_similarity_score,
    )

    h = np.zeros((1, 32, N_VOICES), np.float32)
    h[0, ::4, 0] = 1  # 8 kick hits
    gt = _hvo(h, v=h * 0.8)
    np.testing.assert_allclose(vel_similarity_score(gt, gt), [1.0])

    pred = _hvo(h, v=h * 0.5)  # off by 0.3 at every hit
    np.testing.assert_allclose(
        vel_similarity_score(pred, gt), [1.0 - 0.3**2], rtol=1e-6)

    # garbage velocities where GT has no hits must not matter
    noisy = pred.copy()
    noisy[0, 1::4, N_VOICES] = 0.99  # non-hit cells of voice 0
    np.testing.assert_allclose(
        vel_similarity_score(noisy, gt), [1.0 - 0.3**2], rtol=1e-6)


def test_stats_table_vel_similarity_not_constant():
    """The stats CSV's retained "Vel Similarity Score" column must measure
    prediction fidelity, not render a constant placeholder."""
    rng = np.random.default_rng(7)
    h = (rng.random((6, 32, N_VOICES)) < 0.3).astype(np.float32)
    gt = _hvo(h, v=h * 0.8)
    pred_perfect = gt.copy()
    pred_bad = _hvo(h, v=h * 0.2)
    tags = ["funk"] * 3 + ["rock"] * 3
    col = "Statistical::Vel Similarity Score__Prediction"
    df_perfect = features_table(gt, pred_perfect, tags)
    df_bad = features_table(gt, pred_bad, tags)
    np.testing.assert_allclose(df_perfect[col], 1.0)
    assert (df_bad[col] < 1.0).all()
    # GT against itself is exactly 1 by construction
    np.testing.assert_allclose(
        df_bad["Statistical::Vel Similarity Score__Ground_Truth"], 1.0)
