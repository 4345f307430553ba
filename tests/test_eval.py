"""Recall and VOC AP evaluation golden tests."""

import numpy as np
import pytest

from aznet_tpu.eval import proposal_recall, recall_table, voc_ap, eval_detections_on_roidb


def test_recall_perfect_and_zero():
    gt = [np.array([[0, 0, 9, 9], [50, 50, 79, 79]], np.float32)]
    props = [np.array([[0, 0, 9, 9], [50, 50, 79, 79], [200, 200, 220, 220]], np.float32)]
    assert proposal_recall(gt, props, top_k=10, iou_thresh=0.5) == 1.0
    far = [np.array([[200, 200, 210, 210]], np.float32)]
    assert proposal_recall(gt, far, top_k=10, iou_thresh=0.5) == 0.0


def test_recall_topk_cutoff():
    gt = [np.array([[0, 0, 9, 9]], np.float32)]
    # Matching proposal is ranked 3rd: recall@2 = 0, recall@3 = 1.
    props = [np.array(
        [[100, 100, 120, 120], [200, 200, 220, 220], [0, 0, 9, 9]], np.float32
    )]
    assert proposal_recall(gt, props, top_k=2) == 0.0
    assert proposal_recall(gt, props, top_k=3) == 1.0


def test_recall_table_structure():
    gt = [np.array([[0, 0, 9, 9]], np.float32)] * 2
    props = [np.array([[0, 0, 9, 9]], np.float32)] * 2
    table = recall_table(gt, props, top_ks=(1, 10), iou_threshs=(0.5, 0.9))
    assert table[1][0.5] == 1.0
    assert "AR" in table[1]


def test_voc_ap_definitions():
    # Perfect detector: AP = 1 under both metrics.
    rec = np.array([0.5, 1.0])
    prec = np.array([1.0, 1.0])
    assert voc_ap(rec, prec, use_07_metric=False) == 1.0
    assert abs(voc_ap(rec, prec, use_07_metric=True) - 1.0) < 1e-9
    # Half precision at full recall.
    rec2 = np.array([1.0])
    prec2 = np.array([0.5])
    assert voc_ap(rec2, prec2, use_07_metric=False) == 0.5


def test_eval_detections_end_to_end():
    roidb = [
        {
            "boxes": np.array([[0, 0, 9, 9], [50, 50, 89, 89]], np.float32),
            "gt_classes": np.array([1, 2], np.int32),
        },
        {
            "boxes": np.array([[10, 10, 39, 39]], np.float32),
            "gt_classes": np.array([1], np.int32),
        },
    ]
    # all_boxes[cls][img] = [N, 5]
    empty = np.zeros((0, 5), np.float32)
    all_boxes = [
        [empty, empty],  # background unused
        [np.array([[0, 0, 9, 9, 0.9]], np.float32),
         np.array([[10, 10, 39, 39, 0.8], [10, 10, 39, 39, 0.7]], np.float32)],
        [np.array([[50, 50, 89, 89, 0.6]], np.float32), empty],
    ]
    aps = eval_detections_on_roidb(all_boxes, roidb, num_classes=3)
    # class 1: both gt found (one duplicate FP at lower score): AP = 1.0
    assert abs(aps["class_1"] - 1.0) < 1e-9
    assert abs(aps["class_2"] - 1.0) < 1e-9
    assert abs(aps["mAP"] - 1.0) < 1e-9


def test_eval_detections_misses_and_fps():
    roidb = [
        {
            "boxes": np.array([[0, 0, 9, 9], [100, 100, 139, 139]], np.float32),
            "gt_classes": np.array([1, 1], np.int32),
        }
    ]
    # One TP (high score), one FP (higher score) -> precision hit.
    all_boxes = [
        [np.zeros((0, 5), np.float32)],
        [np.array([[300, 300, 320, 320, 0.95], [0, 0, 9, 9, 0.9]], np.float32)],
    ]
    aps = eval_detections_on_roidb(all_boxes, roidb, num_classes=2)
    # recall max 0.5; precision at that point 0.5 -> all-point AP = 0.25
    assert abs(aps["class_1"] - 0.25) < 1e-9


def test_difficult_gt_ignored():
    roidb = [
        {
            "boxes": np.array([[0, 0, 9, 9], [50, 50, 89, 89]], np.float32),
            "gt_classes": np.array([1, 1], np.int32),
            "difficult": np.array([False, True]),
        }
    ]
    # Detect only the difficult one: no TP, no FP from it, npos = 1 -> AP 0.
    all_boxes = [
        [np.zeros((0, 5), np.float32)],
        [np.array([[50, 50, 89, 89, 0.9]], np.float32)],
    ]
    aps = eval_detections_on_roidb(all_boxes, roidb, num_classes=2)
    assert aps["class_1"] == 0.0


# ---------------------------------------------------------------------------
# COCO-protocol AP (eval/coco_eval.py) — hand-computed mini cases
# ---------------------------------------------------------------------------


def _mk_roidb(gt_per_img, n_classes=2):
    """gt_per_img: list of (boxes [G,4], classes [G])."""
    return [
        {"boxes": np.asarray(b, np.float64).reshape(-1, 4),
         "gt_classes": np.asarray(c, np.int32).reshape(-1)}
        for b, c in gt_per_img
    ]


def _mk_all_boxes(dets, n_classes, n_img):
    """dets: {cls: [per-image [N,5] lists]}."""
    out = [[np.zeros((0, 5))] * n_img for _ in range(n_classes)]
    for c, per_img in dets.items():
        for i, d in enumerate(per_img):
            out[c][i] = np.asarray(d, np.float64).reshape(-1, 5)
    return out


def test_coco_ap_perfect():
    from aznet_tpu.eval.coco_eval import coco_eval

    roidb = _mk_roidb([([[0, 0, 9, 9]], [1])])
    ab = _mk_all_boxes({1: [[[0, 0, 9, 9, 0.9]]]}, 2, 1)
    r = coco_eval(ab, roidb, 2)
    assert r["AP"] == pytest.approx(1.0)
    assert r["AP50"] == pytest.approx(1.0)
    assert r["AP75"] == pytest.approx(1.0)
    # 10x10 box (offset=1) is 'small' (< 32^2); other ranges have no gt.
    assert r["AP_small"] == pytest.approx(1.0)
    assert np.isnan(r["AP_medium"]) and np.isnan(r["AP_large"])
    assert r["AR@1"] == pytest.approx(1.0)


def test_coco_ap_iou_band():
    from aznet_tpu.eval.coco_eval import coco_eval

    # det covers 60% of gt exactly: IoU = 0.6 -> TP at thresholds
    # {.5,.55,.6}, FP at the other 7 -> AP = 3/10.
    roidb = _mk_roidb([([[0, 0, 9, 9]], [1])])
    ab = _mk_all_boxes({1: [[[0, 0, 9, 5, 0.9]]]}, 2, 1)
    r = coco_eval(ab, roidb, 2)
    assert r["AP"] == pytest.approx(0.3)
    assert r["AP50"] == pytest.approx(1.0)
    assert r["AP75"] == pytest.approx(0.0)


def test_coco_ap_duplicate_efficiency():
    from aznet_tpu.eval.coco_eval import coco_eval

    # A duplicate detection AFTER full recall does not reduce COCO AP
    # (precision envelope at recall 1.0 is taken before the duplicate).
    roidb = _mk_roidb([([[0, 0, 9, 9]], [1])])
    ab = _mk_all_boxes({1: [[[0, 0, 9, 9, 0.9], [0, 0, 9, 9, 0.8]]]}, 2, 1)
    r = coco_eval(ab, roidb, 2)
    assert r["AP"] == pytest.approx(1.0)
    # ...but a higher-scored FP halves sampled precision at every recall
    # point: 101-point AP = mean of p=0.5 over all thresholds.
    ab2 = _mk_all_boxes({1: [[[50, 50, 59, 59, 0.95], [0, 0, 9, 9, 0.9]]]}, 2, 1)
    r2 = coco_eval(ab2, roidb, 2)
    assert r2["AP"] == pytest.approx(0.5)


def test_coco_ap_classes_without_gt_excluded():
    from aznet_tpu.eval.coco_eval import coco_eval

    roidb = _mk_roidb([([[0, 0, 9, 9]], [1])], n_classes=3)
    ab = _mk_all_boxes({1: [[[0, 0, 9, 9, 0.9]]],
                        2: [[[0, 0, 9, 9, 0.3]]]}, 3, 1)
    r = coco_eval(ab, roidb, 3)
    # class 2 has no gt anywhere: excluded from the mean, not zeroed.
    assert r["AP"] == pytest.approx(1.0)
    assert "class_1_AP" in r and "class_2_AP" not in r


def test_coco_ar_maxdets():
    from aznet_tpu.eval.coco_eval import coco_eval

    # two gts; the correct det for the second is ranked below a fp, so
    # AR@1 sees only the first -> 0.5; AR@10 sees both -> 1.0.
    roidb = _mk_roidb([([[0, 0, 9, 9], [100, 100, 149, 149]], [1, 1])])
    ab = _mk_all_boxes({1: [[[0, 0, 9, 9, 0.9],
                             [300, 300, 309, 309, 0.5],
                             [100, 100, 149, 149, 0.4]]]}, 2, 1)
    r = coco_eval(ab, roidb, 2)
    assert r["AR@1"] == pytest.approx(0.5)
    assert r["AR@10"] == pytest.approx(1.0)


def test_coco_area_range_ignores():
    from aznet_tpu.eval.coco_eval import coco_eval

    # 50x50 gt (area 2500) is 'medium'; in the 'small' range it is ignored:
    # a det matching it is neither TP nor FP there, so AP_small is nan
    # (no small gt at all) while AP_medium is 1.
    roidb = _mk_roidb([([[0, 0, 49, 49]], [1])])
    ab = _mk_all_boxes({1: [[[0, 0, 49, 49, 0.9]]]}, 2, 1)
    r = coco_eval(ab, roidb, 2)
    assert np.isnan(r["AP_small"])
    assert r["AP_medium"] == pytest.approx(1.0)
    assert r["AP"] == pytest.approx(1.0)


def test_coco_imdb_uses_coco_protocol(tmp_path, monkeypatch):
    from aznet_tpu.data.coco import COCOImdb
    import json as _json

    root = tmp_path / "coco"
    (root / "annotations").mkdir(parents=True)
    ann = {
        "images": [{"id": 1, "file_name": "a.jpg", "height": 100, "width": 100}],
        "annotations": [{"id": 1, "image_id": 1, "category_id": 7,
                         "bbox": [10, 10, 20, 20], "iscrowd": 0}],
        "categories": [{"id": 7, "name": "cat"}],
    }
    (root / "annotations" / "instances_minival.json").write_text(_json.dumps(ann))
    monkeypatch.setenv("AZNET_DATA_DIR", str(tmp_path))
    imdb = COCOImdb("minival")
    boxes = imdb.gt_roidb()[0]["boxes"]
    ab = [[np.zeros((0, 5))], [np.concatenate([boxes[0], [0.9]])[None]]]
    r = imdb.evaluate_detections(ab, str(tmp_path))
    assert r["AP"] == pytest.approx(1.0)
    assert r["mAP@0.5_voc_protocol"] == pytest.approx(1.0)


def test_coco_crowd_absorbs_detections():
    from aznet_tpu.eval.coco_eval import coco_eval

    # A detection on a crowd region is neither TP nor FP; the crowd stays
    # matchable, so MULTIPLE detections on it are all absorbed. Crowd IoU
    # uses intersection-over-detection, so small dets inside a big crowd
    # still match it.
    roidb = [{
        "boxes": np.array([[0, 0, 9, 9], [100, 100, 199, 199]], np.float64),
        "gt_classes": np.array([1, 1], np.int32),
        "crowd": np.array([False, True]),
    }]
    ab = _mk_all_boxes(
        {1: [[[110, 110, 129, 129, 0.95],   # inside crowd: absorbed
              [150, 150, 169, 169, 0.92],   # inside crowd: also absorbed
              [0, 0, 9, 9, 0.9]]]}, 2, 1)   # real gt: TP
    r = coco_eval(ab, roidb, 2)
    assert r["AP"] == pytest.approx(1.0)
    assert r["AP50"] == pytest.approx(1.0)
    # Without crowd flags those two dets outrank the TP as FPs -> AP < 1.
    roidb_nc = [dict(roidb[0], crowd=np.array([False, False]))]
    r_nc = coco_eval(ab, roidb_nc, 2)
    assert r_nc["AP50"] < 1.0


def test_coco_taken_ignored_noncrowd_gt_not_rematchable():
    from aznet_tpu.eval.coco_eval import coco_eval

    # pycocotools: a TAKEN non-crowd gt is skipped even when area-ignored.
    # In the 'small' range the medium gt absorbs only the FIRST det on it;
    # the second (small-area, in-range) det must count as FP.
    roidb = [{
        "boxes": np.array([[0, 0, 9, 9], [100, 100, 133, 133]], np.float64),
        "gt_classes": np.array([1, 1], np.int32),
    }]
    ab = _mk_all_boxes(
        {1: [[[100, 100, 130, 130, 0.95],   # absorbed by ignored medium gt
              [100, 100, 130, 130, 0.9],    # gt taken -> FP (in small range)
              [0, 0, 9, 9, 0.8]]]}, 2, 1)   # TP on the small gt
    r = coco_eval(ab, roidb, 2)
    # IoU(det, medium gt) = 961/1156 ~ 0.83: absorbed at thr <= 0.80
    # (7 thrs -> prec 1/2), unmatched+FP at {.85,.9,.95} (prec 1/3).
    assert r["AP_small"] == pytest.approx((7 * 0.5 + 3 * (1 / 3)) / 10)
