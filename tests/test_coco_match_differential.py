"""Differential test: our COCO matcher vs a literal pycocotools transcription.

VERDICT r2 "missing #5" asked for an official-eval cross-check. pycocotools
is not installed on this machine, so the reference here is a line-by-line
transcription of ``COCOeval.evaluateImg``'s bbox matching loop (the part of
the protocol with real tie-break/ignore subtleties), run against
``aznet_tpu.eval.coco_eval._match_image`` on hundreds of randomized cases.

Reference semantics transcribed (pycocotools cocoeval.py, evaluateImg):
  - detections scanned in score order; gts pre-sorted ignored-last
  - a taken non-crowd gt is skipped; crowds stay matchable forever
  - once a detection has a non-ignored match, reaching the ignored section
    breaks the scan (ignored gts only matter when no non-ignored gt
    cleared the threshold)
  - the running best starts at min(t, 1-1e-10) and updates on
    ``iou >= best`` (ties resolve to the LAST qualifying gt in scan order)
"""

import numpy as np
import pytest

from aznet_tpu.eval.coco_eval import IOU_THRS, _match_image


def _evaluate_img_reference(ious, gt_ignore, crowd, iou_thrs):
    """Literal transcription of pycocotools' per-image bbox matcher.

    Inputs follow the same pre-conditions as ``_match_image``: detections
    score-sorted (rows) and gts sorted ignored-last (columns).
    Returns (dt_match [T, D] bool, dt_ignore [T, D] bool).
    """
    n_t = len(iou_thrs)
    n_d, n_g = ious.shape
    gtm = -np.ones((n_t, n_g), dtype=int)
    dtm = -np.ones((n_t, n_d), dtype=int)
    dtig = np.zeros((n_t, n_d), bool)
    for tind, t in enumerate(iou_thrs):
        for dind in range(n_d):
            iou = min(t, 1.0 - 1e-10)
            m = -1
            for gind in range(n_g):
                # gt already matched, and not a crowd, continue
                if gtm[tind, gind] >= 0 and not crowd[gind]:
                    continue
                # dt matched to a regular gt, and on ignore gt, stop
                if m > -1 and not gt_ignore[m] and gt_ignore[gind]:
                    break
                # continue to next gt unless better match made
                if ious[dind, gind] < iou:
                    continue
                # match successful and best so far, store appropriately
                iou = ious[dind, gind]
                m = gind
            if m == -1:
                continue
            dtig[tind, dind] = gt_ignore[m]
            dtm[tind, dind] = m
            gtm[tind, m] = dind
    return dtm >= 0, dtig


def _random_case(rng):
    n_d = int(rng.integers(0, 9))
    n_g = int(rng.integers(0, 9))
    # Quantized IoUs provoke exact ties (the tie-break rule under test);
    # values straddle every threshold in the .5:.05:.95 grid.
    ious = rng.choice(
        [0.0, 0.3, 0.5, 0.55, 0.6, 0.7, 0.75, 0.8, 0.9, 0.95, 1.0],
        size=(n_d, n_g))
    crowd = rng.random(n_g) < 0.25
    # crowd implies ignored (the only configuration coco_eval produces:
    # g_ig = crowd | out-of-area-range), and gts come sorted ignored-last
    gt_ignore = crowd | (rng.random(n_g) < 0.3)
    order = np.argsort(gt_ignore, kind="stable")
    return ious[:, order], gt_ignore[order], crowd[order]


def _impls():
    """Every matcher implementation: the dispatching entry (C++ when the
    host lib is built — conftest builds it), the vectorized NumPy
    fallback, and the sequential in-module oracle."""
    from aznet_tpu.eval.coco_eval import _match_image_np, _match_image_ref

    clamp = lambda t: np.minimum(np.asarray(t, np.float64), 1 - 1e-10)  # noqa: E731
    return [
        ("dispatch", _match_image),
        ("numpy", lambda i, g, c, t: _match_image_np(i, g, c, clamp(t))),
        ("seq", _match_image_ref),
    ]


@pytest.mark.parametrize("seed", range(5))
@pytest.mark.parametrize("impl", [i[0] for i in _impls()])
def test_match_image_equals_pycocotools_transcription(seed, impl):
    fn = dict(_impls())[impl]
    rng = np.random.default_rng(seed)
    for trial in range(100):
        ious, gt_ignore, crowd = _random_case(rng)
        if ious.shape[0] == 0 or ious.shape[1] == 0:
            continue  # _match_image_np/ref assume the dispatch's 0-guard
        got_m, got_ig = fn(ious, gt_ignore, crowd, IOU_THRS)
        ref_m, ref_ig = _evaluate_img_reference(ious, gt_ignore, crowd,
                                                IOU_THRS)
        np.testing.assert_array_equal(
            got_m, ref_m,
            err_msg=f"dt_match diverged (seed={seed} trial={trial})\n"
                    f"ious=\n{ious}\ngt_ignore={gt_ignore}\ncrowd={crowd}")
        np.testing.assert_array_equal(
            got_ig, ref_ig,
            err_msg=f"dt_ignore diverged (seed={seed} trial={trial})\n"
                    f"ious=\n{ious}\ngt_ignore={gt_ignore}\ncrowd={crowd}")


@pytest.mark.parametrize("impl", ["dispatch", "numpy"])
def test_match_image_fast_equals_sequential_at_scale(impl):
    """The C++ and T/D-vectorized matchers == the sequential in-module
    oracle at real-COCO per-image sizes (D~100, G~40), where the
    no-hope-detection prune and the conflict-prefix rounds actually fire."""
    from aznet_tpu.eval.coco_eval import _match_image_ref

    fn = dict(_impls())[impl]
    rng = np.random.default_rng(7)
    for trial in range(20):
        n_d = int(rng.integers(1, 101))
        n_g = int(rng.integers(1, 41))
        ious = rng.choice(
            [0.0, 0.0, 0.0, 0.3, 0.5, 0.55, 0.7, 0.75, 0.9, 0.95, 1.0],
            size=(n_d, n_g))
        crowd = rng.random(n_g) < 0.2
        gt_ignore = crowd | (rng.random(n_g) < 0.3)
        order = np.argsort(gt_ignore, kind="stable")
        ious, gt_ignore, crowd = ious[:, order], gt_ignore[order], crowd[order]
        got = fn(ious, gt_ignore, crowd, IOU_THRS)
        ref = _match_image_ref(ious, gt_ignore, crowd, IOU_THRS)
        np.testing.assert_array_equal(got[0], ref[0], err_msg=f"t{trial}")
        np.testing.assert_array_equal(got[1], ref[1], err_msg=f"t{trial}")


def test_match_image_crowd_absorbs_many():
    """One crowd region absorbs any number of detections (none TP/FP)."""
    ious = np.array([[0.9], [0.8], [0.7]])
    gt_ignore = np.array([True])
    crowd = np.array([True])
    dtm, dtig = _match_image(ious, gt_ignore, crowd, np.array([0.5]))
    assert dtm.all() and dtig.all()
    ref_m, ref_ig = _evaluate_img_reference(ious, gt_ignore, crowd,
                                            np.array([0.5]))
    np.testing.assert_array_equal(dtm, ref_m)
    np.testing.assert_array_equal(dtig, ref_ig)


def test_match_image_prefers_nonignored_over_higher_iou_ignored():
    """A non-ignored gt at 0.6 beats an ignored gt at 0.9 (pycocotools
    breaks before the ignored section once a regular match exists)."""
    ious = np.array([[0.6, 0.9]])
    gt_ignore = np.array([False, True])
    crowd = np.array([False, False])
    dtm, dtig = _match_image(ious, gt_ignore, crowd, np.array([0.5]))
    assert dtm[0, 0] and not dtig[0, 0]
    ref_m, ref_ig = _evaluate_img_reference(ious, gt_ignore, crowd,
                                            np.array([0.5]))
    np.testing.assert_array_equal(dtm, ref_m)
    np.testing.assert_array_equal(dtig, ref_ig)
