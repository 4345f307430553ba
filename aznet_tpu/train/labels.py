"""AZ training label generation (host, NumPy — one-time per minibatch).

Reference equivalent (SURVEY.md §2.1 "AZ training"): the roidb/label prep in
``lib/detect/train.py`` — the novel part vs fast-rcnn. Rules (AZ paper §3.3
as reconstructed; exact reference constants unverifiable — empty mount):

- **Zoom label** z*(region) = 1 iff the region contains a gt object (inter/
  gt-area >= ZOOM_CONTAIN_THRESH) that is small relative to the region
  (gt area / region area < ZOOM_AREA_FRAC) — i.e. further subdivision is
  needed to localize it.
- **Adjacency labels**: each of the K template anchors matches the gt box
  with highest IoU; confidence label 1 iff that IoU >= ADJ_FG_THRESH, and a
  smooth-L1 regression target (bbox_transform) toward it, normalized by
  BBOX_NORMALIZE_MEANS/STDS (the fast-rcnn trick; the stds are un-baked at
  checkpoint time or applied at decode — see utils/checkpoint.py).

Region sampling mirrors the reference's "gt-perturbation + simulated search
tree" scheme: the deterministic division tree down to a few levels plus
jittered gt boxes, subsampled with a positive/negative balance.
"""

from __future__ import annotations

import numpy as np

from aznet_tpu.config import TrainConfig
from aznet_tpu.utils.np_boxes import (
    area_np as _area,
    intersection_np as _inter,
    iou_np as _iou,
    bbox_transform_np as _bbox_transform_np,
)


def division_tree_regions(im_hw, levels: int, min_size: float = 0.0,
                          offset: float = 1.0,
                          div_overlap: float = 0.0) -> np.ndarray:
    """All regions of the full division tree down to ``levels`` (no gating).

    ``div_overlap`` must match SEAR.DIV_OVERLAP so zoom-label regions are
    generated on the same division geometry the search actually visits.
    """
    from aznet_tpu.search.oracle import _apply_normalized_np
    from aznet_tpu.search.templates import division_table

    table = division_table(div_overlap)
    h, w = float(im_hw[0]), float(im_hw[1])
    whole = np.array([[0.0, 0.0, w - offset, h - offset]], np.float32)
    out = [whole]
    current = whole
    for _ in range(levels):
        current = _apply_normalized_np(current, table, offset).reshape(-1, 4)
        if min_size:
            sz = np.minimum(current[:, 2] - current[:, 0] + offset,
                            current[:, 3] - current[:, 1] + offset)
            current = current[sz >= min_size]
        if current.size == 0:
            break
        out.append(current)
    return np.concatenate(out, axis=0)


def perturb_gt_regions(gt: np.ndarray, im_hw, n_per_gt: int, rng,
                       offset: float = 1.0) -> np.ndarray:
    """Jittered-scale/translated copies of gt boxes (positive-rich anchors)."""
    if gt.shape[0] == 0 or n_per_gt == 0:
        return np.zeros((0, 4), np.float32)
    h, w = float(im_hw[0]), float(im_hw[1])
    reps = np.repeat(gt, n_per_gt, axis=0).astype(np.float32)
    gw = reps[:, 2] - reps[:, 0] + offset
    gh = reps[:, 3] - reps[:, 1] + offset
    scale = np.exp(rng.uniform(-0.4, 0.6, (reps.shape[0], 2)))
    shift = rng.uniform(-0.2, 0.2, (reps.shape[0], 2))
    cx = reps[:, 0] + 0.5 * gw + shift[:, 0] * gw
    cy = reps[:, 1] + 0.5 * gh + shift[:, 1] * gh
    nw = gw * scale[:, 0]
    nh = gh * scale[:, 1]
    out = np.stack(
        [cx - 0.5 * nw, cy - 0.5 * nh, cx + 0.5 * nw - offset, cy + 0.5 * nh - offset],
        axis=1,
    )
    out[:, 0::2] = np.clip(out[:, 0::2], 0, w - offset)
    out[:, 1::2] = np.clip(out[:, 1::2], 0, h - offset)
    return out.astype(np.float32)


def az_labels_for_regions(regions: np.ndarray, gt: np.ndarray,
                          tcfg: TrainConfig, templates: np.ndarray,
                          offset: float = 1.0):
    """Labels for anchor ``regions [R, 4]`` against ``gt [G, 4]``.

    Returns dict: zoom_labels [R], adj_labels [R, K], adj_targets [R, K, 4]
    (normalized), adj_inside [R, K, 4].
    """
    from aznet_tpu.search.oracle import _apply_normalized_np

    r = regions.shape[0]
    k = templates.shape[0]
    out = {
        "zoom_labels": np.zeros((r,), np.float32),
        "adj_labels": np.zeros((r, k), np.float32),
        "adj_targets": np.zeros((r, k, 4), np.float32),
        "adj_inside": np.zeros((r, k, 4), np.float32),
    }
    if gt.shape[0] == 0 or r == 0:
        return out

    # Zoom: contained & relatively-small gt exists.
    inter = _inter(gt, regions, offset)  # [G, R]
    contained = inter / _area(gt, offset)[:, None] >= tcfg.ZOOM_CONTAIN_THRESH
    small = (_area(gt, offset)[:, None] / _area(regions, offset)[None]
             < tcfg.ZOOM_AREA_FRAC)
    out["zoom_labels"] = np.any(contained & small, axis=0).astype(np.float32)

    # Adjacency: per-template anchor matching.
    anchors = _apply_normalized_np(regions, templates, offset)  # [R, K, 4]
    flat = anchors.reshape(-1, 4)
    iou = _iou(flat, gt, offset)  # [R*K, G]
    best = np.argmax(iou, axis=1)
    best_iou = iou[np.arange(iou.shape[0]), best]
    pos = best_iou >= tcfg.ADJ_FG_THRESH
    targets = _bbox_transform_np(flat, gt[best], offset)
    if tcfg.BBOX_NORMALIZE_TARGETS:
        means = np.asarray(tcfg.BBOX_NORMALIZE_MEANS, np.float32)
        stds = np.asarray(tcfg.BBOX_NORMALIZE_STDS, np.float32)
        targets = (targets - means) / stds
    out["adj_labels"] = pos.reshape(r, k).astype(np.float32)
    out["adj_targets"] = np.where(pos[:, None], targets, 0.0).reshape(r, k, 4)
    out["adj_inside"] = np.repeat(pos[:, None], 4, axis=1).astype(np.float32).reshape(r, k, 4)
    return out


def sample_az_regions(gt: np.ndarray, im_hw, tcfg: TrainConfig, rng,
                      tree_levels: int = 3, n_per_gt: int = 8,
                      offset: float = 1.0, div_overlap: float = 0.0,
                      extra: np.ndarray | None = None) -> np.ndarray:
    """Anchor regions for one image: division tree + jittered gt (+ mined
    ``extra`` regions, e.g. search-visited frontiers from train/mining.py),
    subsampled to TRAIN.REGIONS_PER_IMAGE with a positive bias."""
    tree = division_tree_regions(im_hw, tree_levels, offset=offset,
                                 div_overlap=div_overlap)
    jitter = perturb_gt_regions(gt, im_hw, n_per_gt, rng, offset=offset)
    pool = [tree, jitter]
    if extra is not None and extra.size:
        pool.append(np.asarray(extra, np.float32).reshape(-1, 4))
    regions = np.concatenate(pool, axis=0)
    n = tcfg.REGIONS_PER_IMAGE
    if regions.shape[0] <= n:
        return regions
    # Bias sampling toward regions that overlap gt at all.
    if gt.shape[0]:
        ov = _iou(regions, gt, offset).max(axis=1)
    else:
        ov = np.zeros(regions.shape[0])
    pos_idx = np.flatnonzero(ov >= 0.3)
    neg_idx = np.flatnonzero(ov < 0.3)
    n_pos = min(len(pos_idx), n // 2)
    pick_pos = rng.choice(pos_idx, n_pos, replace=False) if n_pos else np.zeros(0, np.int64)
    n_neg = n - n_pos
    if len(neg_idx) >= n_neg:
        pick_neg = rng.choice(neg_idx, n_neg, replace=False)
    else:
        pick_neg = np.concatenate(
            [neg_idx, rng.choice(regions.shape[0], n_neg - len(neg_idx))])
    return regions[np.concatenate([pick_pos, pick_neg]).astype(np.int64)]


def compute_bbox_target_stats(imdb, cfg, proposals_by_entry=None,
                              max_images: int = 200):
    """Data-driven bbox-target normalization stats (means, stds).

    Reference equivalent: ``lib/roi_data_layer/roidb.py::
    add_bbox_regression_targets`` — when the config does not use the
    precomputed constants, fast-rcnn computes per-coordinate target
    mean/std over all fg examples in the roidb and normalizes with them
    (then bakes them back at snapshot time). Here: sample fg (region, gt)
    pairs the same way training does and return the empirical stats, to be
    placed into TRAIN.BBOX_NORMALIZE_MEANS/STDS.
    """
    rng = np.random.RandomState(cfg.RNG_SEED)
    from aznet_tpu.search.templates import adjacency_templates_np
    from aznet_tpu.search.oracle import _apply_normalized_np

    templates = adjacency_templates_np(cfg.MODEL.NUM_TEMPLATES)
    all_targets = []
    n = min(imdb.num_images, max_images)
    for i in range(n):
        entry = imdb.roidb[i]
        gt = entry["boxes"]
        diff = entry.get("difficult")
        if diff is not None and diff.any():
            gt = gt[~diff]
        if gt.shape[0] == 0:
            continue
        regions = sample_az_regions(gt, (entry["height"], entry["width"]),
                                    cfg.TRAIN, rng, offset=cfg.BOX_OFFSET,
                                    div_overlap=cfg.SEAR.DIV_OVERLAP)
        anchors = _apply_normalized_np(regions, templates, cfg.BOX_OFFSET)
        flat = anchors.reshape(-1, 4)
        iou = _iou(flat, gt, cfg.BOX_OFFSET)
        best = np.argmax(iou, axis=1)
        pos = iou[np.arange(iou.shape[0]), best] >= cfg.TRAIN.ADJ_FG_THRESH
        if pos.any():
            all_targets.append(
                _bbox_transform_np(flat[pos], gt[best[pos]], cfg.BOX_OFFSET))
    if not all_targets:
        return (np.zeros(4, np.float32),
                np.asarray(cfg.TRAIN.BBOX_NORMALIZE_STDS, np.float32))
    t = np.concatenate(all_targets)
    return t.mean(axis=0).astype(np.float32), (t.std(axis=0) + 1e-8).astype(np.float32)
