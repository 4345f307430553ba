"""Golden + property tests for bbox_overlaps (cython_bbox parity)."""

import numpy as np
import jax.numpy as jnp

from aznet_tpu.ops import bbox_overlaps
from aznet_tpu.ops.iou import intersection_over_area


def _overlaps_np(boxes, query, offset=1.0):
    """Direct NumPy transcription of the reference loop semantics."""
    n, k = boxes.shape[0], query.shape[0]
    out = np.zeros((n, k), dtype=np.float32)
    for i in range(n):
        for j in range(k):
            iw = min(boxes[i, 2], query[j, 2]) - max(boxes[i, 0], query[j, 0]) + offset
            ih = min(boxes[i, 3], query[j, 3]) - max(boxes[i, 1], query[j, 1]) + offset
            if iw > 0 and ih > 0:
                ua = (
                    (boxes[i, 2] - boxes[i, 0] + offset) * (boxes[i, 3] - boxes[i, 1] + offset)
                    + (query[j, 2] - query[j, 0] + offset) * (query[j, 3] - query[j, 1] + offset)
                    - iw * ih
                )
                out[i, j] = iw * ih / ua
    return out


def test_golden_simple():
    a = jnp.array([[0.0, 0.0, 9.0, 9.0]])  # area 100
    b = jnp.array([[5.0, 5.0, 14.0, 14.0]])  # area 100, inter 5x5=25
    iou = float(bbox_overlaps(a, b)[0, 0])
    assert abs(iou - 25.0 / 175.0) < 1e-6


def test_disjoint_and_identical():
    a = jnp.array([[0.0, 0.0, 4.0, 4.0], [10.0, 10.0, 14.0, 14.0]])
    iou = np.asarray(bbox_overlaps(a, a))
    np.testing.assert_allclose(iou, np.eye(2), atol=1e-6)


def test_touching_boxes_plus_one_convention():
    # Under +1 convention, boxes sharing an edge coordinate DO intersect
    # (iw = x2 - x1 + 1 = 1 when x2 == x1).
    a = jnp.array([[0.0, 0.0, 4.0, 4.0]])
    b = jnp.array([[4.0, 0.0, 8.0, 4.0]])
    iou = float(bbox_overlaps(a, b)[0, 0])
    assert abs(iou - 5.0 / 45.0) < 1e-6
    # Modern convention: no intersection.
    assert float(bbox_overlaps(a, b, offset=0.0)[0, 0]) == 0.0


def test_matches_numpy_oracle():
    rng = np.random.RandomState(3)
    boxes = rng.uniform(0, 100, (40, 4)).astype(np.float32)
    boxes[:, 2:] = boxes[:, :2] + rng.uniform(1, 50, (40, 2))
    query = rng.uniform(0, 100, (17, 4)).astype(np.float32)
    query[:, 2:] = query[:, :2] + rng.uniform(1, 50, (17, 2))
    got = np.asarray(bbox_overlaps(jnp.asarray(boxes), jnp.asarray(query)))
    want = _overlaps_np(boxes, query)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_intersection_over_area():
    region = jnp.array([[0.0, 0.0, 99.0, 99.0]])
    gt = jnp.array([[0.0, 0.0, 9.0, 9.0], [90.0, 90.0, 109.0, 109.0]])
    ioa = np.asarray(intersection_over_area(gt, region))
    assert ioa[0, 0] == 1.0  # fully contained
    assert abs(ioa[1, 0] - 100.0 / 400.0) < 1e-6  # quarter inside
