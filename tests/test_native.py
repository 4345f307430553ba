"""C++ host library vs NumPy oracles (skipped when csrc isn't built)."""

import numpy as np
import pytest

from aznet_tpu.utils import native

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="libaznet_host.so not built")


def _pure_numpy_nms(dets, thresh, offset=1.0):
    x1, y1, x2, y2, scores = dets[:, 0], dets[:, 1], dets[:, 2], dets[:, 3], dets[:, 4]
    areas = (x2 - x1 + offset) * (y2 - y1 + offset)
    order = np.argsort(-scores, kind="stable")
    keep = []
    while order.size:
        i = order[0]
        keep.append(int(i))
        xx1 = np.maximum(x1[i], x1[order[1:]])
        yy1 = np.maximum(y1[i], y1[order[1:]])
        xx2 = np.minimum(x2[i], x2[order[1:]])
        yy2 = np.minimum(y2[i], y2[order[1:]])
        inter = np.maximum(0, xx2 - xx1 + offset) * np.maximum(0, yy2 - yy1 + offset)
        ovr = inter / (areas[i] + areas[order[1:]] - inter)
        order = order[1:][ovr <= thresh]
    return keep


def test_native_nms_matches_numpy():
    rng = np.random.RandomState(3)
    for n in (1, 17, 200, 1000):
        xy = rng.uniform(0, 500, (n, 2))
        wh = rng.uniform(5, 200, (n, 2))
        s = rng.permutation(n).astype(np.float32) / n
        dets = np.concatenate([xy, xy + wh, s[:, None]], 1).astype(np.float32)
        for t in (0.3, 0.7):
            assert native.nms(dets, t) == _pure_numpy_nms(dets, t)


def test_native_overlaps_matches_numpy():
    from aznet_tpu.eval.recall import _iou_np

    rng = np.random.RandomState(5)
    a = rng.uniform(0, 100, (50, 4)).astype(np.float32)
    a[:, 2:] = a[:, :2] + rng.uniform(1, 50, (50, 2))
    b = rng.uniform(0, 100, (20, 4)).astype(np.float32)
    b[:, 2:] = b[:, :2] + rng.uniform(1, 50, (20, 2))
    np.testing.assert_allclose(native.bbox_overlaps(a, b), _iou_np(a, b), atol=1e-5)


def test_native_prep_blob_matches_host_pipeline():
    from aznet_tpu.ops.preprocess import prep_im_for_blob

    rng = np.random.RandomState(7)
    im = rng.randint(0, 256, (120, 160, 3)).astype(np.uint8)
    means = (102.9801, 115.9465, 122.7717)
    scale = 1.5
    want, s = prep_im_for_blob(im, means, 180, 300)
    assert abs(s - scale) < 1e-9
    got = native.prep_blob(im, 192, 256, scale, means)
    np.testing.assert_allclose(got[:180, :240], want, atol=0.51)
    assert (got[180:] == 0).all() and (got[:, 240:] == 0).all()
