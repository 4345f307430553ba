"""Golden tests for box codecs — Caffe/fast-rcnn convention parity.

Golden values hand-computed from the reference algorithm
(lib/fast_rcnn/bbox_transform.py semantics, SURVEY.md §2.2).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from aznet_tpu.ops import bbox_transform, bbox_transform_inv, clip_boxes, box_area, flip_boxes


def test_bbox_transform_identity():
    boxes = jnp.array([[0.0, 0.0, 9.0, 19.0], [5.0, 5.0, 14.0, 9.0]])
    t = bbox_transform(boxes, boxes)
    np.testing.assert_allclose(np.asarray(t), 0.0, atol=1e-6)


def test_bbox_transform_golden():
    # ex: [0,0,9,19] -> w=10, h=20, ctr=(5,10)
    # gt: [5,2,14,21] -> w=10, h=20, ctr=(10,12)
    ex = jnp.array([[0.0, 0.0, 9.0, 19.0]])
    gt = jnp.array([[5.0, 2.0, 14.0, 21.0]])
    t = np.asarray(bbox_transform(ex, gt))[0]
    np.testing.assert_allclose(t, [0.5, 0.1, 0.0, 0.0], atol=1e-6)

    # size change: gt [0,0,19,9] -> w=20,h=10,ctr=(10,5)
    gt2 = jnp.array([[0.0, 0.0, 19.0, 9.0]])
    t2 = np.asarray(bbox_transform(ex, gt2))[0]
    np.testing.assert_allclose(t2, [0.5, -0.25, np.log(2.0), np.log(0.5)], atol=1e-6)


def test_transform_roundtrip_reference_quirk():
    # Reference parity quirk (fast-rcnn bbox_transform_inv): x2 decodes as
    # ctr + 0.5*w with NO trailing -1, so under the +1 width convention an
    # encode->decode round trip lands on (x1, y1, x2+1, y2+1) exactly.
    rng = np.random.RandomState(3)
    x1y1 = rng.uniform(0, 100, (32, 2))
    wh = rng.uniform(5, 80, (32, 2))
    ex = np.concatenate([x1y1, x1y1 + wh], axis=1).astype(np.float32)
    x1y1g = rng.uniform(0, 100, (32, 2))
    whg = rng.uniform(5, 80, (32, 2))
    gt = np.concatenate([x1y1g, x1y1g + whg], axis=1).astype(np.float32)
    deltas = bbox_transform(jnp.asarray(ex), jnp.asarray(gt))
    rec = np.asarray(bbox_transform_inv(jnp.asarray(ex), deltas))
    want = gt + np.array([0.0, 0.0, 1.0, 1.0], np.float32)
    np.testing.assert_allclose(rec, want, atol=1e-2)
    # Modern convention (offset=0): exact round trip.
    d0 = bbox_transform(jnp.asarray(ex), jnp.asarray(gt), offset=0.0)
    rec0 = np.asarray(bbox_transform_inv(jnp.asarray(ex), d0, offset=0.0))
    np.testing.assert_allclose(rec0, gt, atol=1e-2)


def test_bbox_transform_inv_golden():
    # box [0,0,9,19]: w=10,h=20,ctr=(5,10). deltas (0.5, 0, log2, 1->e)
    boxes = jnp.array([[0.0, 0.0, 9.0, 19.0]])
    deltas = jnp.array([[0.5, 0.0, np.log(2.0), 0.0]])
    out = np.asarray(bbox_transform_inv(boxes, deltas))[0]
    # pred ctr x = 0.5*10+5 = 10; pred w = 20 -> x1 = 0, x2 = 20
    np.testing.assert_allclose(out, [0.0, 0.0, 20.0, 20.0], atol=1e-5)


def test_bbox_transform_inv_multiclass_layout():
    # (N, 4K) layout like the reference's (N, 84) decode.
    boxes = jnp.array([[0.0, 0.0, 9.0, 19.0]])
    deltas = jnp.tile(jnp.array([[0.0, 0.0, 0.0, 0.0, 0.5, 0.0, 0.0, 0.0]]), (1, 1))
    out = np.asarray(bbox_transform_inv(boxes, deltas))
    assert out.shape == (1, 8)
    # Zero deltas decode to (x1, y1, x2+1, y2+1) — the reference quirk.
    np.testing.assert_allclose(out[0, :4], [0.0, 0.0, 10.0, 20.0], atol=1e-5)
    # dx=0.5: ctr_x 5 -> 10, w=10 -> [5, 0, 15, 20].
    np.testing.assert_allclose(out[0, 4:], [5.0, 0.0, 15.0, 20.0], atol=1e-5)


def test_bbox_transform_inv_clip():
    boxes = jnp.array([[0.0, 0.0, 9.0, 9.0]])
    deltas = jnp.array([[0.0, 0.0, 100.0, 100.0]])
    out = np.asarray(bbox_transform_inv(boxes, deltas, clip=np.log(1000.0 / 16.0)))
    w = out[0, 2] - out[0, 0]
    assert w == pytest.approx(10.0 * 1000.0 / 16.0, rel=1e-4)


def test_clip_boxes():
    boxes = jnp.array([[-5.0, -5.0, 700.0, 500.0]])
    out = np.asarray(clip_boxes(boxes, (480, 640)))
    np.testing.assert_allclose(out, [[0.0, 0.0, 639.0, 479.0]])


def test_box_area_plus_one():
    b = jnp.array([[0.0, 0.0, 9.0, 19.0]])
    assert float(box_area(b)[0]) == 200.0
    assert float(box_area(b, offset=0.0)[0]) == 9.0 * 19.0


def test_flip_boxes_caffe_convention():
    # reference: x1' = W - x2 - 1
    b = jnp.array([[10.0, 5.0, 20.0, 15.0]])
    f = np.asarray(flip_boxes(b, 100))
    np.testing.assert_allclose(f, [[79.0, 5.0, 89.0, 15.0]])
    # involution
    ff = np.asarray(flip_boxes(jnp.asarray(f), 100))
    np.testing.assert_allclose(ff, np.asarray(b))


def test_jit_and_vmap():
    boxes = jnp.ones((4, 8, 4)) * jnp.array([0.0, 0.0, 9.0, 9.0])
    deltas = jnp.zeros((4, 8, 4))
    out = jax.jit(bbox_transform_inv)(boxes, deltas)
    want = np.asarray(boxes) + np.array([0.0, 0.0, 1.0, 1.0], np.float32)
    np.testing.assert_allclose(np.asarray(out), want, atol=1e-6)
