"""Differential test: our VOC evaluator vs a literal protocol transcription.

VERDICT r2 "missing #5" asked for an official-eval cross-check of
``aznet_tpu/eval/voc_eval.py``. The VOCdevkit (MATLAB) and py-faster-rcnn's
``voc_eval.py`` are absent on this machine, so the oracle here is a
line-by-line transcription of the official ``VOCevaldet.m`` protocol in the
shape py-faster-rcnn's port made canonical: detections of one class sorted
globally by confidence, each matched to the max-IoU gt of its image
(+1-pixel widths), ``ovmax >= minoverlap`` (the MATLAB comparison — the
py-faster-rcnn port uses strict ``>``, a measure-zero divergence from the
official devkit that our implementation does not copy), difficult gt
neither TP nor FP, re-matching a taken gt is a FP, AP by both the 11-point
(VOC<=2009) and all-point interpolated definitions.

Reference: SURVEY.md §2.2 "VOC evaluation" (mount empty, no file:line
exists — the protocol is transcribed from the public devkit definition).
"""

import numpy as np
import pytest

from aznet_tpu.eval.voc_eval import _match_detections, _pr_from_matches, voc_ap


def _voc_eval_reference(dets_by_img, gt_by_img, diff_by_img, ovthresh,
                        use_07_metric):
    """Literal transcription of the official per-class VOC evaluation.

    dets_by_img: list of (N_i, 5) [x1,y1,x2,y2,score] arrays (0-indexed).
    Returns (rec, prec, ap) exactly as the devkit computes them.
    """
    # class_recs: per image gt state
    class_recs = []
    npos = 0
    for gt, diff in zip(gt_by_img, diff_by_img):
        det = np.zeros(gt.shape[0], dtype=bool)
        npos += int((~diff).sum())
        class_recs.append({"bbox": gt, "difficult": diff, "det": det})

    # flatten detections into (image_ids, confidence, BB)
    image_ids, confidence, BB = [], [], []
    for i, dets in enumerate(dets_by_img):
        for row in dets:
            image_ids.append(i)
            confidence.append(row[4])
            BB.append(row[:4])
    confidence = np.asarray(confidence)
    BB = np.asarray(BB).reshape(-1, 4)

    sorted_ind = np.argsort(-confidence)
    BB = BB[sorted_ind]
    image_ids = [image_ids[x] for x in sorted_ind]

    nd = len(image_ids)
    tp = np.zeros(nd)
    fp = np.zeros(nd)
    for d in range(nd):
        R = class_recs[image_ids[d]]
        bb = BB[d]
        ovmax = -np.inf
        jmax = -1
        BBGT = R["bbox"]
        if BBGT.size > 0:
            ixmin = np.maximum(BBGT[:, 0], bb[0])
            iymin = np.maximum(BBGT[:, 1], bb[1])
            ixmax = np.minimum(BBGT[:, 2], bb[2])
            iymax = np.minimum(BBGT[:, 3], bb[3])
            iw = np.maximum(ixmax - ixmin + 1.0, 0.0)
            ih = np.maximum(iymax - iymin + 1.0, 0.0)
            inters = iw * ih
            uni = ((bb[2] - bb[0] + 1.0) * (bb[3] - bb[1] + 1.0)
                   + (BBGT[:, 2] - BBGT[:, 0] + 1.0)
                   * (BBGT[:, 3] - BBGT[:, 1] + 1.0) - inters)
            overlaps = inters / uni
            ovmax = np.max(overlaps)
            jmax = int(np.argmax(overlaps))
        if ovmax >= ovthresh:  # MATLAB devkit comparison (see module doc)
            if not R["difficult"][jmax]:
                if not R["det"][jmax]:
                    tp[d] = 1.0
                    R["det"][jmax] = True
                else:
                    fp[d] = 1.0
        else:
            fp[d] = 1.0

    fp = np.cumsum(fp)
    tp = np.cumsum(tp)
    rec = tp / float(npos) if npos > 0 else np.zeros(nd)
    prec = tp / np.maximum(tp + fp, np.finfo(np.float64).eps)
    return rec, prec, voc_ap(rec, prec, use_07_metric)


def _random_case(rng, n_images, img_size=200.0):
    """Random gt + detections: jittered copies of gt, duplicates, noise."""
    gt_by_img, diff_by_img, dets_by_img = [], [], []
    for _ in range(n_images):
        n_gt = rng.randint(0, 5)
        x1 = rng.uniform(0, img_size * 0.7, n_gt)
        y1 = rng.uniform(0, img_size * 0.7, n_gt)
        w = rng.uniform(8, img_size * 0.3, n_gt)
        h = rng.uniform(8, img_size * 0.3, n_gt)
        gt = np.stack([x1, y1, x1 + w, y1 + h], axis=1)
        diff = rng.rand(n_gt) < 0.25
        dets = []
        for g in gt:
            for _ in range(rng.randint(0, 3)):  # 0-2 dets per gt (dups!)
                jit = rng.uniform(-12, 12, 4)
                dets.append(np.concatenate([g + jit, [rng.rand()]]))
        for _ in range(rng.randint(0, 3)):  # pure false positives
            fx1, fy1 = rng.uniform(0, img_size * 0.7, 2)
            fw, fh = rng.uniform(8, img_size * 0.3, 2)
            dets.append(np.asarray([fx1, fy1, fx1 + fw, fy1 + fh, rng.rand()]))
        gt_by_img.append(gt)
        diff_by_img.append(diff)
        dets_by_img.append(np.asarray(dets, np.float64).reshape(-1, 5))
    return dets_by_img, gt_by_img, diff_by_img


@pytest.mark.parametrize("use_07_metric", [True, False])
@pytest.mark.parametrize("ovthresh", [0.5, 0.7])
def test_voc_eval_matches_official_transcription(use_07_metric, ovthresh):
    rng = np.random.RandomState(hash((use_07_metric, ovthresh)) % (2**31))
    for trial in range(150):
        dets, gts, diffs = _random_case(rng, n_images=rng.randint(1, 5))
        ref_rec, ref_prec, ref_ap = _voc_eval_reference(
            dets, gts, diffs, ovthresh, use_07_metric)
        tp, fp, scores, npos = _match_detections(dets, gts, diffs, ovthresh)
        rec, prec, ap = _pr_from_matches(tp, fp, scores, npos, use_07_metric)
        if npos == 0 or scores.size == 0:
            # our implementation returns empty curves; the transcription
            # yields rec=0 everywhere — AP must agree at 0
            assert ref_ap == pytest.approx(0.0) and ap == pytest.approx(0.0)
            continue
        assert rec.shape == ref_rec.shape, f"trial {trial}"
        np.testing.assert_allclose(rec, ref_rec, atol=1e-12, err_msg=f"trial {trial}")
        np.testing.assert_allclose(prec, ref_prec, atol=1e-12, err_msg=f"trial {trial}")
        assert ap == pytest.approx(ref_ap, abs=1e-12), f"trial {trial}"


def test_voc_eval_difficult_only_image():
    """An image whose every gt is difficult contributes 0 to npos and its
    matched detections are neither TP nor FP (the devkit ignore protocol)."""
    gt = np.asarray([[10.0, 10.0, 50.0, 50.0]])
    dets = [np.asarray([[10.0, 10.0, 50.0, 50.0, 0.9]])]
    tp, fp, scores, npos = _match_detections(
        dets, [gt], [np.asarray([True])], 0.5)
    assert npos == 0
    assert tp.sum() == 0 and fp.sum() == 0
