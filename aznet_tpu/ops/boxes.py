"""Box coordinate transforms with Caffe/fast-rcnn convention parity.

Reference equivalents (SURVEY.md §2.2): ``lib/fast_rcnn/bbox_transform.py``
(``bbox_transform``, ``bbox_transform_inv``, ``clip_boxes``) — the exact
public names confirmed by BASELINE.json. Boxes are ``[x1, y1, x2, y2]`` with
0-indexed inclusive corners; widths are ``x2 - x1 + offset`` with
``offset=1.0`` matching the reference bit-for-bit and ``offset=0.0`` the
modern half-open convention.

All functions are pure jnp, shape-polymorphic over leading dims, and jit/vmap
friendly — unlike the reference's per-box host NumPy loops, these fuse into
the surrounding XLA program.
"""

from __future__ import annotations

import jax.numpy as jnp


def box_wh(boxes, offset: float = 1.0):
    """Widths and heights of ``[..., 4]`` boxes."""
    w = boxes[..., 2] - boxes[..., 0] + offset
    h = boxes[..., 3] - boxes[..., 1] + offset
    return w, h


def box_area(boxes, offset: float = 1.0):
    w, h = box_wh(boxes, offset)
    return w * h


def box_ctr(boxes, offset: float = 1.0):
    w, h = box_wh(boxes, offset)
    cx = boxes[..., 0] + 0.5 * w
    cy = boxes[..., 1] + 0.5 * h
    return cx, cy, w, h


def bbox_transform(ex_rois, gt_rois, offset: float = 1.0):
    """Regression targets (dx, dy, dw, dh) taking ``ex_rois`` to ``gt_rois``.

    Parity target: lib/fast_rcnn/bbox_transform.py::bbox_transform.
    Shapes: ``[..., 4] x [..., 4] -> [..., 4]``.
    """
    ex_cx, ex_cy, ex_w, ex_h = box_ctr(ex_rois, offset)
    gt_cx, gt_cy, gt_w, gt_h = box_ctr(gt_rois, offset)
    dx = (gt_cx - ex_cx) / ex_w
    dy = (gt_cy - ex_cy) / ex_h
    dw = jnp.log(gt_w / ex_w)
    dh = jnp.log(gt_h / ex_h)
    return jnp.stack([dx, dy, dw, dh], axis=-1)


def bbox_transform_inv(boxes, deltas, offset: float = 1.0, clip: float | None = None):
    """Decode regression deltas against anchor ``boxes``.

    Parity target: lib/fast_rcnn/bbox_transform.py::bbox_transform_inv —
    center/log-size parameterization with ``+offset`` widths; ``x2`` decodes
    as ``ctr + 0.5*w`` with NO trailing ``-offset``, matching the reference
    (a known fast-rcnn quirk: encode->decode round-trips to ``x2 + offset``;
    later frameworks like Detectron added the ``-1`` — the reference did not).

    ``boxes``: ``[..., 4]``; ``deltas``: ``[..., 4*K]`` (class/template-indexed
    groups of 4, as the reference's ``(N, 84)`` layout) or ``[..., K, 4]``.
    Returns decoded boxes with the same shape as ``deltas``.

    ``clip`` bounds dw/dh before exp (cfg.SEAR.BBOX_XFORM_CLIP); the original
    fast-rcnn decode has no clip, pass ``None`` for exact parity.
    """
    flat_groups = deltas.shape[-1] != 4 or deltas.ndim == boxes.ndim
    if flat_groups:
        k = deltas.shape[-1] // 4
        d = deltas.reshape(deltas.shape[:-1] + (k, 4))
    else:
        d = deltas
    cx, cy, w, h = box_ctr(boxes, offset)
    cx, cy, w, h = (t[..., None] for t in (cx, cy, w, h))
    dx, dy, dw, dh = d[..., 0], d[..., 1], d[..., 2], d[..., 3]
    if clip is not None:
        dw = jnp.clip(dw, -clip, clip)
        dh = jnp.clip(dh, -clip, clip)
    pred_cx = dx * w + cx
    pred_cy = dy * h + cy
    pred_w = jnp.exp(dw) * w
    pred_h = jnp.exp(dh) * h
    out = jnp.stack(
        [
            pred_cx - 0.5 * pred_w,
            pred_cy - 0.5 * pred_h,
            pred_cx + 0.5 * pred_w,
            pred_cy + 0.5 * pred_h,
        ],
        axis=-1,
    )
    if flat_groups:
        out = out.reshape(deltas.shape)
    return out


def clip_boxes(boxes, im_shape, offset: float = 1.0):
    """Clip ``[..., 4*K]`` boxes to the image.

    Parity target: lib/fast_rcnn/bbox_transform.py::clip_boxes — clips x to
    ``[0, W-1]`` and y to ``[0, H-1]`` under the +1 convention (``W-offset``
    generally).
    """
    h, w = im_shape[0], im_shape[1]
    shape = boxes.shape
    b = boxes.reshape(shape[:-1] + (shape[-1] // 4, 4))
    x1 = jnp.clip(b[..., 0], 0, w - offset)
    y1 = jnp.clip(b[..., 1], 0, h - offset)
    x2 = jnp.clip(b[..., 2], 0, w - offset)
    y2 = jnp.clip(b[..., 3], 0, h - offset)
    return jnp.stack([x1, y1, x2, y2], axis=-1).reshape(shape)


def flip_boxes(boxes, width, offset: float = 1.0):
    """Horizontal flip: ``x1' = W - x2 - offset`` (reference
    ``imdb.append_flipped_images`` convention, SURVEY.md §2.2)."""
    x1 = width - boxes[..., 2] - offset
    x2 = width - boxes[..., 0] - offset
    return jnp.stack([x1, boxes[..., 1], x2, boxes[..., 3]], axis=-1)


def scale_boxes(boxes, scale):
    """Project boxes between image and feature/scaled coordinates
    (reference ``_project_im_rois``)."""
    return boxes * scale
