"""Evaluator pipeline: subsets, metrics, set_pred, media, pickling."""

import os
import pickle

import numpy as np
import pytest

from transformergrooveinfilling_tpu.data import (
    GrooveMidiDatasetInfillingSymbolic,
    synthetic_gmd_sequences,
)
from transformergrooveinfilling_tpu.eval.evaluator import (
    InfillingEvaluator,
    init_evaluator,
    log_eval,
)
from transformergrooveinfilling_tpu.eval.metrics import metrics_dict
from transformergrooveinfilling_tpu.hvo import N_VOICES


class PerfectModel:
    """Predicts the ground truth exactly."""

    def __init__(self, gt):
        self.gt = np.asarray(gt)

    def predict(self, inputs, use_thres=True, thres=0.5):
        return [self.gt[..., :9], self.gt[..., 9:18], self.gt[..., 18:27]]


@pytest.fixture(scope="module")
def evaluator(tmp_path_factory):
    seqs = synthetic_gmd_sequences(40, seed=13)
    ds = GrooveMidiDatasetInfillingSymbolic(
        data=seqs, dataset_name="EvalDS", split="test",
        save_dataset_path=str(tmp_path_factory.mktemp("ds")),
        voices_params={"voice_idx": [2], "min_n_voices_to_remove": 1,
                       "max_n_voices_to_remove": 1, "prob": [1], "k": 5},
        max_aug_items=2, seed=3, save=False)
    return InfillingEvaluator(
        _identifier="Test_Set", n_samples_to_use=64,
        n_samples_to_synthesize_visualize_per_subset=2,
        dataset=ds, sequences=seqs, horizontal=True)


def test_subsets_built(evaluator):
    assert len(evaluator._gt_tags) > 1
    assert evaluator.processed_inputs.shape[0] == \
        evaluator.processed_gt.shape[0] > 0
    assert len(evaluator._gt_hvos_array_tags) == \
        evaluator.processed_inputs.shape[0]
    # every tag is one of the 11 eval styles
    from transformergrooveinfilling_tpu.eval.evaluator import EVAL_STYLES
    assert set(evaluator._gt_tags).issubset(set(EVAL_STYLES))


def test_templates_align_with_rows(evaluator):
    assert len(evaluator._prediction_hvo_seq_templates) == \
        evaluator.processed_gt.shape[0]
    # template metadata tags align with row tags (grouped order == row order)
    for i, t in enumerate(evaluator._prediction_hvo_seq_templates):
        assert t.metadata.style_primary == evaluator._gt_hvos_array_tags[i]


def test_perfect_prediction_metrics(evaluator):
    model = PerfectModel(evaluator._gt_hvos_array)
    evaluator.set_pred(model)
    acc = evaluator.get_hits_accuracies()
    assert acc[f"Test_Set_Hits_Accuracy_mean"] == pytest.approx(1.0)
    mse_v = evaluator.get_velocity_errors()
    assert mse_v["Test_Set_Velocity_MSE_mean"] == pytest.approx(0.0, abs=1e-9)
    mse_o = evaluator.get_micro_timing_errors()
    assert mse_o["Test_Set_Micro_Timing_MSE_mean"] == pytest.approx(0.0, abs=1e-9)


def test_set_pred_subsets_and_media(evaluator):
    model = PerfectModel(evaluator._gt_hvos_array)
    evaluator.set_pred(model)
    assert sorted(evaluator._prediction_tags) == sorted(
        set(evaluator._gt_hvos_array_tags))
    n_rows = sum(len(s) for s in evaluator._prediction_subsets)
    assert n_rows == evaluator.processed_gt.shape[0]

    media = evaluator.get_wandb_logging_media(recalculate_ground_truth=False)
    assert "piano_roll_html" in media
    roll = media["piano_roll_html"]["Predictions_Test_Set"].html
    assert "<svg" in roll


def test_add_removed_part_merging(evaluator):
    model = PerfectModel(evaluator._gt_hvos_array)
    evaluator.set_pred(model)
    ev = evaluator.prediction_SubSet_Evaluator
    key = next(iter(evaluator.audio_sample_locations))
    if not evaluator.hvo_comp_dict.get(key):
        pytest.skip("no sampled locations for this tag")
    sample = ev.subsets[key][0]
    merged = ev.add_removed_part_to_hvo(sample.copy(), key, 0)
    comp = evaluator.hvo_comp_dict[key][0]
    # merged contains all input-context hits
    assert ((merged.hvo[:, :N_VOICES] > 0) | ~(comp.hvo[:, :N_VOICES] > 0)).all()
    # the context truly wins at its hit cells: velocity/offset come from the
    # context alone, not summed with the prediction's dense v/o heads
    # (deviation from reference evaluator.py:364-372, see PARITY.md)
    rows, cols = np.nonzero(comp.hvo[:, :N_VOICES])
    np.testing.assert_array_equal(merged.hvo[rows, cols + N_VOICES],
                                  comp.hvo[rows, cols + N_VOICES])
    np.testing.assert_array_equal(merged.hvo[rows, cols + 2 * N_VOICES],
                                  comp.hvo[rows, cols + 2 * N_VOICES])
    assert (merged.hvo[:, N_VOICES:2 * N_VOICES] <= 1.0 + 1e-6).all()
    assert (np.abs(merged.hvo[:, 2 * N_VOICES:]) <= 0.5 + 1e-6).all()


def test_evaluator_pickle_roundtrip(evaluator, tmp_path):
    out = evaluator.save_as_pickle(str(tmp_path))
    assert os.path.exists(out)
    loaded = init_evaluator(out, device=None)
    assert loaded._gt_tags == evaluator._gt_tags
    np.testing.assert_allclose(loaded.processed_inputs,
                               evaluator.processed_inputs)
    # loaded evaluator still evaluates
    loaded.set_pred(PerfectModel(loaded._gt_hvos_array))
    acc = loaded.get_hits_accuracies()
    assert acc["Test_Set_Hits_Accuracy_mean"] == pytest.approx(1.0)


def test_log_eval_writes_metrics(evaluator, tmp_path, monkeypatch):
    from transformergrooveinfilling_tpu.utils import logging as xlog

    monkeypatch.chdir(tmp_path)
    xlog.init(config={}, project="eval_test")
    model = PerfectModel(evaluator._gt_hvos_array)
    log_eval(evaluator, model, log_media=True, epoch=0, dump=True)
    xlog.finish()
    metrics_file = os.path.join("runs", "eval_test",
                                os.listdir(os.path.join("runs", "eval_test"))[0],
                                "metrics.jsonl")
    text = open(metrics_file).read()
    assert "Test_Set_Hits_Accuracy_mean" in text
    # evaluator dump written
    assert os.path.isdir("evaluator")
    dumps = os.listdir("evaluator")
    assert any(f.endswith(".Eval") for f in dumps)
    # dumped evaluator unpickles
    with open(os.path.join("evaluator", dumps[0]), "rb") as f:
        ev2 = pickle.load(f)
    assert ev2._identifier == evaluator._identifier


def test_metrics_dict_shape(rng):
    pred = (rng.random((4, 32, 27)) > 0.5).astype(np.float32)
    gt = (rng.random((4, 32, 27)) > 0.5).astype(np.float32)
    d = metrics_dict(pred, gt, "X")
    assert len(d) == 3 * 10  # 9 voices + mean per family
    assert all(np.isfinite(v) for v in d.values())


def test_metrics_host_inputs_never_touch_the_device(rng, monkeypatch):
    """Host numpy stacks must reduce in numpy: on a tunneled TPU backend the
    device round-trips cost seconds per eval epoch (first fetch ~100 s —
    profiled, docs/PERF.md round 3). Device-resident stacks still take the
    jitted path with ONE fetch for all three families."""
    import jax
    import jax.numpy as jnp

    import transformergrooveinfilling_tpu.eval.metrics as em

    def boom(*a, **k):
        raise AssertionError("jitted metric path used for host numpy inputs")

    monkeypatch.setattr(em, "_metric_stack_jit", boom)
    pred = (rng.random((4, 32, 27)) > 0.5).astype(np.float32)
    gt = (rng.random((4, 32, 27)) > 0.5).astype(np.float32)
    d = metrics_dict(pred, gt, "X")
    assert len(d) == 3 * 10

    monkeypatch.undo()
    # numpy and jitted paths agree on device inputs
    d_dev = metrics_dict(jnp.asarray(pred), jnp.asarray(gt), "X")
    for k, v in d.items():
        assert np.isclose(d_dev[k], v, rtol=1e-6), k
    del jax


def test_feature_pdf_media(evaluator):
    from transformergrooveinfilling_tpu.eval.media import feature_pdf_html

    html = feature_pdf_html(
        {t: s for t, s in zip(evaluator._gt_tags, evaluator._gt_subsets)},
        "GT")
    assert "<svg" in html and "Syncopation::Combined" in html

    ev = evaluator.gt_SubSet_Evaluator
    d = ev.get_logging_dict(audio_files=False, global_features_html=True)
    assert "global_feature_pdfs" in d and "<svg" in d["global_feature_pdfs"]


def test_media_persisted_to_run_dir(evaluator, tmp_path, monkeypatch):
    """The local sink writes Html/Audio media as real files under media/."""
    from transformergrooveinfilling_tpu.utils import logging as xlog

    monkeypatch.chdir(tmp_path)
    xlog.init(config={}, project="media_test")
    evaluator.set_pred(PerfectModel(evaluator._gt_hvos_array))
    log_eval(evaluator, PerfectModel(evaluator._gt_hvos_array),
             log_media=True, epoch=1, dump=False)
    run_dir = xlog.run.dir
    xlog.finish()
    media_dir = os.path.join(run_dir, "media")
    assert os.path.isdir(media_dir)
    files = os.listdir(media_dir)
    assert any(f.endswith(".html") for f in files)
    assert any(f.endswith(".wav") for f in files)
    # the JSONL references the persisted paths
    text = open(os.path.join(run_dir, "metrics.jsonl")).read()
    assert "media/" in text


def test_loss_curve_svg_rendered(tmp_path, monkeypatch):
    from transformergrooveinfilling_tpu.utils import logging as xlog

    monkeypatch.chdir(tmp_path)
    xlog.init(config={}, project="curves")
    for ep in range(5):
        xlog.log({"loss": 3.0 - ep * 0.3, "validation_loss": 3.1 - ep * 0.25,
                  "hit_accuracy": 0.5 + ep * 0.05, "epoch": ep}, commit=True)
    run_dir = xlog.run.dir
    xlog.finish()
    svg = os.path.join(run_dir, "curves.svg")
    assert os.path.exists(svg)
    text = open(svg).read()
    assert "<path" in text and "validation_loss" in text


def test_media_html_well_formed(evaluator):
    """Emitted media parses as HTML (self-contained SVG, no external deps)."""
    from html.parser import HTMLParser

    class Checker(HTMLParser):
        def __init__(self):
            super().__init__()
            self.svg = 0

        def handle_starttag(self, tag, attrs):
            if tag == "svg":
                self.svg += 1
            for name, value in attrs:
                assert "http" not in (value or "") or "www.w3.org" in value, \
                    f"external reference in media: {value}"

    evaluator.set_pred(PerfectModel(evaluator._gt_hvos_array))
    html_doc = evaluator.prediction_SubSet_Evaluator.get_piano_rolls()
    c = Checker()
    c.feed(html_doc)
    assert c.svg >= 1


def test_proportional_budget_unit():
    from transformergrooveinfilling_tpu.eval.evaluator import (
        proportional_budget)

    # under budget: everything kept
    assert proportional_budget([5, 3, 2], 100) == [5, 3, 2]
    # over budget: proportional, all subsets survive
    q = proportional_budget([80, 10, 10], 20)
    assert sum(q) == 20 and all(x >= 1 for x in q)
    assert q[0] > q[1] and q[0] > q[2]
    # hard skew: one giant subset must not starve the tail
    q = proportional_budget([1000, 1, 1, 1], 10)
    assert sum(q) == 10 and q[1] == q[2] == q[3] == 1
    # budget smaller than subset count: still sums to budget
    q = proportional_budget([5, 5, 5, 5], 2)
    assert sum(q) == 2
    # quotas never exceed subset sizes
    q = proportional_budget([2, 100], 50)
    assert q[0] <= 2 and sum(q) == 50


def test_budget_preserves_all_styles(tmp_path):
    """VERDICT r1 #4: with a corpus where the first style alone exceeds
    n_samples_to_use, every style must keep eval coverage (the greedy
    truncation zeroed late styles silently)."""
    from transformergrooveinfilling_tpu.data.synthetic import STYLES

    skew = synthetic_gmd_sequences(36, seed=21, styles=["hiphop"])
    tail = synthetic_gmd_sequences(22, seed=22, styles=STYLES)
    corpus = skew + tail
    ds = GrooveMidiDatasetInfillingSymbolic(
        data=corpus, dataset_name="BudgetDS", split="test",
        save_dataset_path=str(tmp_path), voices_params={
            "voice_idx": [2], "min_n_voices_to_remove": 1,
            "max_n_voices_to_remove": 1, "prob": [1], "k": 5},
        max_aug_items=1, seed=3, save=False)
    ev = InfillingEvaluator(
        _identifier="Test_Set", n_samples_to_use=24,
        n_samples_to_synthesize_visualize_per_subset=1,
        dataset=ds, sequences=corpus, horizontal=True)
    assert set(ev._gt_tags) == set(STYLES)  # all 11 styles survive
    sizes = {t: len(s) for t, s in zip(ev._gt_tags, ev._gt_subsets)}
    assert sum(sizes.values()) <= 24
    assert sizes["hiphop"] > 1  # proportionally larger, not starved either


def test_analyze_heatmap_honored(evaluator):
    """analyze_heatmap=False must actually disable heatmap rendering
    (VERDICT r2 weak #4: flags stored but ignored)."""
    model = PerfectModel(evaluator._gt_hvos_array)
    evaluator.set_pred(model)
    ev = evaluator.prediction_SubSet_Evaluator
    ev.analyze_heatmap = False
    d = ev.get_logging_dict(global_features_html=False, audio_files=False)
    assert "velocity_heatmaps" not in d
    ev.analyze_heatmap = True
    d = ev.get_logging_dict(global_features_html=False, audio_files=False)
    assert "velocity_heatmaps" in d


def test_horizontal_flag_changes_heatmap_orientation(evaluator):
    """horizontal=False (the reference's Random-experiment setting,
    process_evaluator.py:25-29) renders transposed heatmaps — time runs
    top→bottom (PARITY.md: the flag is dead in the reference itself; these
    are the semantics this stack assigns it)."""
    model = PerfectModel(evaluator._gt_hvos_array)
    evaluator.set_pred(model)
    ev = evaluator.prediction_SubSet_Evaluator
    ev.horizontal = True
    wide = ev.get_velocity_heatmaps()
    ev.horizontal = False
    tall = ev.get_velocity_heatmaps()
    assert wide != tall
    assert "t0" in tall and "t31" in tall   # per-step row labels
    assert "t31" not in wide                # voice-lane labels instead
    assert "KICK" in wide


def test_progress_counter_when_tqdm_enabled(evaluator, capsys):
    """disable_tqdm=False produces visible progress during media loops."""
    model = PerfectModel(evaluator._gt_hvos_array)
    evaluator.set_pred(model)
    ev = evaluator.prediction_SubSet_Evaluator
    ev.disable_tqdm = False
    ev.get_piano_rolls()
    err = capsys.readouterr().err
    assert "Creating piano rolls" in err


def test_get_audios_ragged_grids_fallback():
    """Mixed grid shapes can't stack for the batched mixer; the per-item
    fallback must still render every sampled loop (and match direct
    synthesis)."""
    from transformergrooveinfilling_tpu.eval.evaluator import (
        HVOSeqSubsetInfillingEvaluator,
    )
    from transformergrooveinfilling_tpu.hvo import HVOSequence

    short = HVOSequence(hvo=np.zeros((16, 27), np.float32))
    long = HVOSequence(hvo=np.zeros((32, 27), np.float32))
    for s in (short, long):
        s.hvo[0, 0] = 1.0
        s.hvo[0, 9] = 0.9
        s.metadata.style_primary = "funk"
        s.metadata.master_id = "m/1"
    ev = HVOSeqSubsetInfillingEvaluator(
        [[short], [long]], ["funk16", "funk32"], "Ragged_Set", is_gt=True)
    audios = ev.get_audios()
    assert len(audios) == 2
    lens = sorted(len(w) for _, w in audios)
    assert lens[0] < lens[1]  # each item keeps its own length
    np.testing.assert_array_equal(
        audios[0][1] if len(audios[0][1]) == lens[0] else audios[1][1],
        short.synthesize())


def test_deferred_media_pass_snapshots_its_epoch(evaluator, tmp_path,
                                                 monkeypatch):
    """log_eval(defer=...) must hand back a closure that renders THIS epoch's
    predictions even after a later set_pred replaced the evaluator state (the
    driver's async media worker runs it during the next training block)."""
    from transformergrooveinfilling_tpu.utils import logging as xlog

    monkeypatch.chdir(tmp_path)
    xlog.init(config={}, project="defer_test")
    run_dir, run_id = xlog.run.dir, xlog.run.id

    deferred = []
    log_eval(evaluator, PerfectModel(evaluator._gt_hvos_array),
             log_media=True, epoch=7, dump=False, defer=deferred.append)
    assert len(deferred) == 1
    csv_path = os.path.join(run_dir, f"stats_{run_id}_Epoch_7.csv")
    assert not os.path.exists(csv_path)  # nothing rendered yet

    # a later epoch replaces the prediction state with all-zeros predictions
    class ZeroModel:
        def predict(self, inputs, use_thres=True, thres=0.5):
            z = np.zeros(inputs.shape[:2] + (9,), np.float32)
            return [z, z, z]

    evaluator.set_pred(ZeroModel())

    deferred[0]()  # the deferred pass runs AFTER the mutation
    xlog.finish()

    # the CSV reflects the captured (perfect) predictions: velocity
    # similarity at GT-hit cells is exactly 1.0, impossible for ZeroModel
    import csv as _csv
    with open(csv_path) as f:
        rows = list(_csv.reader(f))
    header = rows[0]
    col = header.index("Statistical::Vel Similarity Score__Prediction")
    overall = [r for r in rows if r and r[0] == "Overall"][0]
    assert float(overall[col]) == pytest.approx(1.0)
    # media files carry the deferred epoch's tag
    media = os.listdir(os.path.join(run_dir, "media"))
    assert any("epoch_7" in f for f in media)
    # and the committed JSONL record is attributed to epoch 7
    recs = [l for l in open(os.path.join(run_dir, "metrics.jsonl"))
            if "Test_Set_stats" in l]
    import json as _json
    assert _json.loads(recs[-1])["epoch"] == 7


def test_sink_log_is_thread_safe(tmp_path, monkeypatch):
    """Concurrent log() calls (training thread + media worker) must never
    interleave half-written JSONL lines."""
    import json as _json
    import threading

    from transformergrooveinfilling_tpu.utils import logging as xlog

    monkeypatch.chdir(tmp_path)
    xlog.init(config={}, project="lock_test")

    def hammer(tid):
        for i in range(50):
            xlog.log({f"k{tid}": i, "epoch": i}, commit=True)

    threads = [threading.Thread(target=hammer, args=(t,)) for t in range(8)]
    [t.start() for t in threads]
    [t.join() for t in threads]
    path = os.path.join(xlog.run.dir, "metrics.jsonl")
    xlog.finish()
    lines = open(path).read().splitlines()
    assert len(lines) == 400
    for l in lines:
        _json.loads(l)  # every line is complete valid JSON


def test_deferred_media_record_never_steals_pending_scalars(tmp_path,
                                                            monkeypatch):
    """A worker-thread media record must NOT sweep the training thread's
    uncommitted (commit=False) scalars into its own line — they belong to a
    different epoch's record (the async-media attribution race)."""
    import json as _json

    from transformergrooveinfilling_tpu.utils import logging as xlog

    monkeypatch.chdir(tmp_path)
    xlog.init(config={}, project="attr_test")
    # training thread stages epoch-8 scalars, not yet committed
    xlog.log({"loss": 0.5, "epoch": 8}, commit=False)
    # the deferred epoch-7 media pass lands mid-block
    xlog.log_record({"Test_Set_stats": "media/x.html", "epoch": 7})
    # training thread commits its block record
    xlog.log({"epoch": 8}, commit=True)
    path = os.path.join(xlog.run.dir, "metrics.jsonl")
    xlog.finish()
    recs = [_json.loads(l) for l in open(path)]
    media = [r for r in recs if "Test_Set_stats" in r][0]
    scalar = [r for r in recs if "loss" in r][0]
    assert media["epoch"] == 7 and "loss" not in media
    assert scalar["epoch"] == 8 and scalar["loss"] == 0.5
