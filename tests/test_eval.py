"""Recall and VOC AP evaluation golden tests."""

import numpy as np

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
