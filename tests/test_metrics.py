"""Metric suite tests with hand-computable goldens."""
import numpy as np
import pytest

pytestmark = pytest.mark.smoke

from mesm_tpu.metrics import (
    compute_mr_ap,
    compute_mr_r1,
    eval_submission,
    get_data_by_range,
    interpolated_precision_recall,
)
from mesm_tpu.postprocess import SpanPostProcessor, temporal_nms


def _sub(qid, windows):
    return dict(qid=qid, query="q", vid="v", pred_relevant_windows=windows,
                pred_saliency_scores=[0.0])


def _gt(qid, windows):
    return dict(qid=qid, relevant_windows=windows)


def test_perfect_predictions_score_100():
    submission = [
        _sub(1, [[10.0, 20.0, 0.9]]),
        _sub(2, [[0.0, 30.0, 0.8]]),
    ]
    gt = [_gt(1, [[10.0, 20.0]]), _gt(2, [[0.0, 30.0]])]
    r1 = compute_mr_r1(submission, gt)
    assert r1["0.5"] == 100.0 and r1["0.95"] == 100.0 and r1["miou"] == 100.0
    ap = compute_mr_ap(submission, gt, num_workers=1)
    assert ap["average"] == 100.0


def test_r1_threshold_boundary():
    # IoU = 0.5 exactly: pred [0,10], gt [5,15] -> paired loose IoU = 5/15
    submission = [_sub(1, [[0.0, 10.0, 1.0]])]
    gt = [_gt(1, [[5.0, 15.0]])]
    r1 = compute_mr_r1(submission, gt, iou_thds=np.array([0.3, 0.5]))
    # loose union = enclosing = 15; inter = 5 -> 0.3333
    assert r1["0.3"] == 100.0
    assert r1["0.5"] == 0.0
    np.testing.assert_allclose(r1["miou"], 100 * 5 / 15, atol=0.01)


def test_ap_half_matched():
    """Two GT windows, one matched prediction -> recall caps at 0.5."""
    submission = [_sub(1, [[0.0, 10.0, 0.9]])]
    gt = [_gt(1, [[0.0, 10.0], [50.0, 60.0]])]
    ap = compute_mr_ap(submission, gt, iou_thds=np.array([0.5]), num_workers=1)
    assert ap["0.5"] == 50.0


def test_get_data_by_range():
    submission = [_sub(1, [[0, 5, 1.0]]), _sub(2, [[0, 50, 1.0]])]
    gt = [_gt(1, [[0.0, 5.0]]), _gt(2, [[0.0, 50.0]])]
    s, g = get_data_by_range(submission, gt, [0, 10], 150)
    assert [e["qid"] for e in g] == [1]
    assert [e["qid"] for e in s] == [1]
    s, g = get_data_by_range(submission, gt, [0, 150], 150)
    assert len(g) == 2  # full range returns everything


def test_eval_submission_brief_keys():
    submission = [_sub(i, [[0.0, 10.0, 0.9]]) for i in range(4)]
    gt = [_gt(i, [[0.0, 10.0]]) for i in range(4)]
    out = eval_submission(submission, gt, dataset_name="charades", num_workers=1)
    brief = out["brief"]
    for key in ["MR-full-R1@0.3", "MR-full-R1@0.5", "MR-full-R1@0.7",
                "MR-full-miou", "MR-full-mAP", "MR-full-mAP@0.5", "MR-full-mAP@0.75"]:
        assert key in brief
    assert brief["MR-full-mAP"] == 100.0
    assert "full" in out and "short" in out


def test_interp_pr():
    # single point precision 1 recall 1 -> AP 1
    assert interpolated_precision_recall(np.array([1.0]), np.array([1.0])) == 1.0
    # precision 0.5 at recall 1 -> AP 0.5
    assert interpolated_precision_recall(np.array([0.5]), np.array([1.0])) == 0.5


def test_postprocessor_round_and_clip():
    post = SpanPostProcessor(clip_length=2, min_ts_val=0, max_ts_val=150,
                             process_func_names=("clip_ts", "round_multiple"))
    lines = [{"pred_relevant_windows": [[-3.0, 7.2, 0.5], [149.0, 260.0, 0.25]]}]
    out = post(lines)[0]["pred_relevant_windows"]
    assert out[0][:2] == [0.0, 8.0]
    # 149 clips to 149, rounds (half-to-even) to 74.5 -> 74 -> 148; 260 clips to 150
    assert out[1][:2] == [148.0, 150.0]
    assert out[0][2] == 0.5


def test_nms_suppresses_overlaps():
    preds = [[0.0, 10.0, 0.9], [1.0, 11.0, 0.8], [50.0, 60.0, 0.7]]
    kept = temporal_nms(preds, nms_thd=0.5, max_after_nms=10)
    assert kept[0] == [0.0, 10.0, 0.9]
    assert [50.0, 60.0, 0.7] in kept
    assert [1.0, 11.0, 0.8] not in kept  # loose IoU 9/11 > 0.5 suppressed
