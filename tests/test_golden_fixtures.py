"""Hand-derived golden metric fixtures (independent of any transcription).

VERDICT r3 "missing #4": the VOC and COCO evaluators' differential tests
use in-repo protocol TRANSCRIPTIONS as oracles — a self-reference loop.
Real VOCdevkit/pycocotools runs are impossible on this machine (no
network, neither tool installed), so these fixtures do the next-best
thing: scenarios small enough that the correct AP/AR values are DERIVED BY
HAND in the comments, with every matching/ranking/interpolation step
written out. A bug in both the evaluator and its transcription would still
fail here.

Conventions: inclusive integer boxes (+1 widths); a 10x10 box is
[0, 0, 9, 9].
"""

import numpy as np

from aznet_tpu.eval.coco_eval import coco_eval
from aznet_tpu.eval.voc_eval import eval_detections_on_roidb


def _img(boxes, classes, difficult=None, crowd=None):
    boxes = np.asarray(boxes, np.float64).reshape(-1, 4)
    e = {"boxes": boxes, "gt_classes": np.asarray(classes, np.int64),
         "height": 300, "width": 300}
    if difficult is not None:
        e["difficult"] = np.asarray(difficult, bool)
    if crowd is not None:
        e["crowd"] = np.asarray(crowd, bool)
    return e


def test_voc_ap_golden_by_hand():
    """Two images, one class, a difficult gt, a duplicate det.

    gts: imgA g1=[0,0,9,9]; imgB g2=[0,0,9,9] + DIFFICULT g3=[100,100,
    109,109]. npos = 2 (difficult excluded from the denominator).

    dets (score order): d1 imgA [0,0,9,9] s.9 -> IoU(g1)=1 -> TP;
    d2 imgA [0,0,9,9] s.8 -> g1 taken -> FP; d3 imgB [100,100,109,109]
    s.7 -> matches the DIFFICULT gt -> ignored (neither TP nor FP);
    d4 imgB [50,50,59,59] s.6 -> matches nothing -> FP.

    Cumulative (ignored det contributes nothing):
      rank1: tp=1 fp=0 -> rec .5, prec 1
      rank2: tp=1 fp=1 -> rec .5, prec 1/2
      rank4: tp=1 fp=2 -> rec .5, prec 1/3
    All-point AP = integral of the precision envelope over recall: recall
    only ever reaches 0.5, first at precision 1 -> AP = 0.5 * 1.0 = 0.5.
    11-point AP = mean of max precision at r in {0,.1,...,1}: 1.0 at the
    six points r <= 0.5, 0 at the five above -> 6/11.
    """
    roidb = [
        _img([[0, 0, 9, 9]], [1]),
        _img([[0, 0, 9, 9], [100, 100, 109, 109]], [1, 1],
             difficult=[False, True]),
    ]
    all_boxes = [None, [
        np.array([[0, 0, 9, 9, 0.9], [0, 0, 9, 9, 0.8]], np.float64),
        np.array([[100, 100, 109, 109, 0.7], [50, 50, 59, 59, 0.6]],
                 np.float64),
    ]]
    ap = eval_detections_on_roidb(all_boxes, roidb, num_classes=2,
                                  use_07_metric=False)
    np.testing.assert_allclose(ap["class_1"], 0.5, atol=1e-12)
    ap07 = eval_detections_on_roidb(all_boxes, roidb, num_classes=2,
                                    use_07_metric=True)
    np.testing.assert_allclose(ap07["class_1"], 6.0 / 11.0, atol=1e-12)


def test_coco_ap_golden_by_hand():
    """One image, one class, two gts, the IoU grid worked by hand.

    gts: g1=[0,0,9,9], g2=[20,0,29,9] (areas 100 -> 'small' range).
    dets: d1=[0,0,9,9] s.9 -> IoU(g1)=1.0, IoU(g2)=0 -> TP everywhere.
    d2=[22,0,29,9] s.8 -> inter with g2 = 8x10=80, union = 100+80-80=100
    -> IoU 0.8 exactly -> TP for t in {.50,...,.80} (7 thresholds),
    unmatched FP for t in {.85,.90,.95}.

    Per threshold t <= .8: tps=[1,1] -> rec=[.5,1], prec=[1,1]; the
    101-point sample is 1 everywhere -> AP_t = 1.
    Per threshold t > .8: tps=[1,0], fps=[0,1] -> rec=[.5,.5],
    prec=[1,.5]; envelope [1,.5]; recall grid: the 51 points r <= 0.5 take
    precision 1, the rest 0 -> AP_t = 51/101.
    AP = (7*1 + 3*51/101)/10; AP50 = AP75 = 1; AR@100 = (7*1 + 3*.5)/10.
    AR@1 = max recall with 1 det = 0.5 at every t -> 0.5.
    """
    roidb = [_img([[0, 0, 9, 9], [20, 0, 29, 9]], [1, 1])]
    all_boxes = [None, [
        np.array([[0, 0, 9, 9, 0.9], [22, 0, 29, 9, 0.8]], np.float64),
    ]]
    r = coco_eval(all_boxes, roidb, num_classes=2)
    want_ap = (7 * 1.0 + 3 * (51.0 / 101.0)) / 10.0
    np.testing.assert_allclose(r["AP"], want_ap, atol=1e-12)
    np.testing.assert_allclose(r["AP50"], 1.0, atol=1e-12)
    np.testing.assert_allclose(r["AP75"], 1.0, atol=1e-12)
    np.testing.assert_allclose(r["AP_small"], want_ap, atol=1e-12)
    np.testing.assert_allclose(r["AR@100"], (7 * 1.0 + 3 * 0.5) / 10.0,
                               atol=1e-12)
    np.testing.assert_allclose(r["AR@1"], 0.5, atol=1e-12)
    assert np.isnan(r["AP_medium"]) and np.isnan(r["AP_large"])


def test_coco_crowd_golden_by_hand():
    """Crowd absorption changes AP from 0.5 to 1.0 — derived by hand.

    gts: CROWD c=[0,0,99,99]; regular g=[0,0,9,9]. npos = 1.
    dets: d1=[40,40,49,49] s.95 — entirely inside the crowd; crowd IoU is
    intersection-over-DET-area = 100/100 = 1 -> absorbed (ignored) at
    every threshold. d2=[0,0,9,9] s.9 -> prefers the NON-ignored g even
    though the crowd also overlaps -> TP at every threshold.

    With absorption: ranked effective dets = [TP] -> rec=[1], prec=[1]
    -> AP = 1 at every threshold. If crowd absorption were broken (d1
    counted as FP at rank 1): prec=[0,.5] -> envelope .5 -> AP = .5 —
    so this fixture pins the crowd rule, not just the happy path.
    """
    roidb = [_img([[0, 0, 99, 99], [0, 0, 9, 9]], [1, 1],
                  crowd=[True, False])]
    all_boxes = [None, [
        np.array([[40, 40, 49, 49, 0.95], [0, 0, 9, 9, 0.9]], np.float64),
    ]]
    r = coco_eval(all_boxes, roidb, num_classes=2)
    np.testing.assert_allclose(r["AP"], 1.0, atol=1e-12)
    np.testing.assert_allclose(r["AR@100"], 1.0, atol=1e-12)


def test_coco_area_range_ignore_golden_by_hand():
    """Out-of-range gts become ignore regions, not misses.

    gts: g_small=[0,0,9,9] (area 100), g_large=[100,100,199,199] (area
    10000 -> 'medium' range is (1024, 9216]; 10000 is 'large').
    dets: d1=[0,0,9,9] s.9 (area 100), d2=[100,100,199,199] s.8.

    'small' range: npos=1 (g_large out of range -> ignored). d1 TP.
    d2 matches the IGNORED g_large (fallback) -> ignored, and its own
    area is out of range anyway. rec=[1], prec=[1] -> AP_small = 1.
    'large': npos=1 (g_small ignored); d1 matches ignored g_small ->
    ignored (its area is also out of range); d2 TP -> AP_large = 1.
    'all': both TP at every t -> AP = 1.
    """
    roidb = [_img([[0, 0, 9, 9], [100, 100, 199, 199]], [1, 1])]
    all_boxes = [None, [
        np.array([[0, 0, 9, 9, 0.9], [100, 100, 199, 199, 0.8]], np.float64),
    ]]
    r = coco_eval(all_boxes, roidb, num_classes=2)
    np.testing.assert_allclose(r["AP"], 1.0, atol=1e-12)
    np.testing.assert_allclose(r["AP_small"], 1.0, atol=1e-12)
    np.testing.assert_allclose(r["AP_large"], 1.0, atol=1e-12)
