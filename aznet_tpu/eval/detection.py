"""Dataset-level inference drivers: propose-all, recall eval, full detection.

Reference equivalents (SURVEY.md §3.4/§3.5): the test tool loops — per
image: ``im_propose`` (recall mode) or ``im_propose`` + ``im_detect`` +
per-class NMS (mAP mode), detections cached and handed to
``imdb.evaluate_detections``.
"""

from __future__ import annotations

import pickle
import os
from typing import List, Optional

import numpy as np

from aznet_tpu.api import Net, im_propose, im_detect
from aznet_tpu.config import Config
from aznet_tpu.ops.nms import nms
from aznet_tpu.utils.timer import Timer


def propose_all(net: Net, imdb, max_images: Optional[int] = None,
                verbose: bool = False) -> List[np.ndarray]:
    """im_propose over an imdb. Returns per-image [N, 5] dets."""
    n = min(imdb.num_images, max_images or imdb.num_images)
    timer = Timer()
    out = []
    for i in range(n):
        entry = imdb.roidb[i]
        im = imdb.image_array(entry)
        timer.tic()
        out.append(im_propose(net, im))
        t = timer.toc(average=False)
        if verbose and (i + 1) % 50 == 0:
            print(f"propose {i + 1}/{n} {t:.3f}s (avg {timer.average_time:.3f}s)")
    return out


def propose_all_batched(net: Net, imdb, batch_size: int = 16,
                        max_images: Optional[int] = None,
                        verbose: bool = False) -> List[np.ndarray]:
    """Batched im_propose over an imdb (BASELINE config 2's workload).

    Images are bucketed by canvas shape (one compiled program per bucket),
    padded to full batches, and run through the jit-native batched pipeline —
    the throughput path the host-looped reference cannot express.
    """
    import jax
    import jax.numpy as jnp

    from aznet_tpu.api import make_propose_batch_padded, _canvas_for
    from aznet_tpu.ops.preprocess import compute_scale

    cfg = net.cfg
    n = min(imdb.num_images, max_images or imdb.num_images)
    # Bucket image indices by CANVAS only; raw images are zero-padded on
    # host to the bucket's (rounded-up) max raw shape, so real VOC's dozens
    # of distinct raw sizes compile one program per canvas, not per size.
    buckets: dict = {}
    for i in range(n):
        e = imdb.roidb[i]
        buckets.setdefault(_canvas_for(e["height"], e["width"], cfg), []).append(i)

    rup = lambda v, m=32: int(-(-v // m) * m)
    out: List[Optional[np.ndarray]] = [None] * n
    timer = Timer()
    for canvas, idxs in buckets.items():
        hp = rup(max(imdb.roidb[i]["height"] for i in idxs))
        wp = rup(max(imdb.roidb[i]["width"] for i in idxs))
        key = ("propose_batched", canvas, hp, wp, batch_size)
        fn = net.get_jit(key, lambda: jax.jit(
            make_propose_batch_padded(net.model, cfg, canvas)))
        for start in range(0, len(idxs), batch_size):
            chunk = idxs[start : start + batch_size]
            ims = np.zeros((batch_size, hp, wp, 3), np.float32)
            src_hw = np.zeros((batch_size, 2), np.float32)
            scales = np.ones((batch_size,), np.float32)
            for j, i in enumerate(chunk):
                im = imdb.image_array(imdb.roidb[i])
                ims[j, : im.shape[0], : im.shape[1]] = im
                src_hw[j] = (im.shape[0], im.shape[1])
                scales[j] = compute_scale(im.shape[0], im.shape[1],
                                          cfg.TEST.SCALES[0], cfg.TEST.MAX_SIZE)
            if len(chunk) < batch_size:  # pad the tail batch
                src_hw[len(chunk):] = src_hw[len(chunk) - 1]
                scales[len(chunk):] = scales[len(chunk) - 1]
            timer.tic()
            boxes, scores, valid = fn(net.params, jnp.asarray(ims),
                                      jnp.asarray(src_hw), jnp.asarray(scales))
            boxes, scores, valid = (np.asarray(boxes), np.asarray(scores),
                                    np.asarray(valid))
            t = timer.toc(average=False)
            for j, i in enumerate(chunk):
                m = valid[j]
                out[i] = np.concatenate(
                    [boxes[j][m], scores[j][m][:, None]], axis=1
                ).astype(np.float32)
            if verbose:
                print(f"propose_batched {start + len(chunk)}/{len(idxs)} "
                      f"(canvas {canvas}) {t / batch_size * 1000:.1f} ms/img")
    return out  # type: ignore[return-value]


def refine_proposals_batched(frcnn_net: Net, imdb,
                             proposals: List[np.ndarray],
                             batch_size: int = 16,
                             verbose: bool = False) -> List[np.ndarray]:
    """Second decode pass over cached AZ proposals (high-IoU recall lever).

    Each proposal is re-pooled through the FRCNN head and its box replaced
    by the argmax-FOREGROUND-class regression decode
    (:func:`aznet_tpu.api.select_class_boxes`); scores and ordering are the
    AZ search's, so recall@K compares the same candidate set with tighter
    boxes. The one-shot adjacency regression caps AR (round-3 verdict weak
    #5: recall@IoU .9 was 0.22 vs 0.95 at .5); this reuses the
    detect-head machinery at eval only — no retraining, no new params.
    """
    import jax
    import jax.numpy as jnp

    from aznet_tpu.api import (_canvas_for, make_detect_batch_padded,
                               select_class_boxes)
    from aznet_tpu.ops.preprocess import compute_scale

    cfg = frcnn_net.cfg
    n = len(proposals)
    r_pad = max(int(max((p.shape[0] for p in proposals), default=1)), 1)

    rup = lambda v, m=32: int(-(-v // m) * m)
    buckets: dict = {}
    for i in range(n):
        e = imdb.roidb[i]
        buckets.setdefault(_canvas_for(e["height"], e["width"], cfg), []).append(i)
    out: List[Optional[np.ndarray]] = [None] * n
    for canvas, idxs in buckets.items():
        hp = rup(max(imdb.roidb[i]["height"] for i in idxs))
        wp = rup(max(imdb.roidb[i]["width"] for i in idxs))

        def build():
            base = make_detect_batch_padded(frcnn_net.model, cfg, canvas)

            def refined(params, ims, src_hw, scales, boxes):
                scores, pred = base(params, ims, src_hw, scales, boxes)
                return jax.vmap(select_class_boxes)(scores, pred)

            return jax.jit(refined)

        key = ("refine_batched", canvas, hp, wp, batch_size, r_pad)
        fn = frcnn_net.get_jit(key, build)
        for start in range(0, len(idxs), batch_size):
            chunk = idxs[start : start + batch_size]
            ims = np.zeros((batch_size, hp, wp, 3), np.float32)
            src_hw = np.zeros((batch_size, 2), np.float32)
            scales = np.ones((batch_size,), np.float32)
            boxes_in = np.zeros((batch_size, r_pad, 4), np.float32)
            for j, i in enumerate(chunk):
                im = imdb.image_array(imdb.roidb[i])
                ims[j, : im.shape[0], : im.shape[1]] = im
                src_hw[j] = (im.shape[0], im.shape[1])
                scales[j] = compute_scale(im.shape[0], im.shape[1],
                                          cfg.TEST.SCALES[0], cfg.TEST.MAX_SIZE)
                boxes_in[j, : proposals[i].shape[0]] = proposals[i][:, :4]
            if len(chunk) < batch_size:
                src_hw[len(chunk):] = src_hw[len(chunk) - 1]
                scales[len(chunk):] = scales[len(chunk) - 1]
            refined = np.asarray(fn(frcnn_net.params, jnp.asarray(ims),
                                    jnp.asarray(src_hw), jnp.asarray(scales),
                                    jnp.asarray(boxes_in)))
            for j, i in enumerate(chunk):
                k = proposals[i].shape[0]
                out[i] = np.concatenate(
                    [refined[j][:k], proposals[i][:, 4:5]], axis=1
                ).astype(np.float32)
        if verbose:
            print(f"refined {len(idxs)} images (canvas {canvas})")
    return out  # type: ignore[return-value]


def evaluate_recall(net: Net, imdb, top_ks=(100, 300, 1000),
                    max_images: Optional[int] = None, batched: bool = False,
                    batch_size: int = 16, include_difficult: bool = False,
                    refine_net: Optional[Net] = None):
    """Proposal recall table over an imdb (BASELINE config 2).

    VOC protocol excludes 'difficult' instances from the recall denominator
    (as the mAP eval does); set ``include_difficult=True`` for the raw count.
    ``refine_net``: an FRCNN net for the optional second decode pass
    (:func:`refine_proposals_batched`).
    """
    from aznet_tpu.eval.recall import recall_table

    n = min(imdb.num_images, max_images or imdb.num_images)
    if batched:
        proposals = propose_all_batched(net, imdb, batch_size=batch_size,
                                        max_images=n)
    else:
        proposals = propose_all(net, imdb, max_images=n)
    if refine_net is not None:
        proposals = refine_proposals_batched(refine_net, imdb, proposals,
                                             batch_size=batch_size)
    gts = []
    for i in range(n):
        entry = imdb.roidb[i]
        boxes = entry["boxes"]
        diff = entry.get("difficult")
        if not include_difficult and diff is not None and np.asarray(diff).any():
            boxes = boxes[~np.asarray(diff, bool)]
        gts.append(boxes)
    return recall_table(gts, proposals, top_ks=top_ks)


def detect_all(az_net: Net, frcnn_net: Net, imdb,
               max_images: Optional[int] = None,
               max_per_image: Optional[int] = None,
               cache_file: Optional[str] = None):
    """Full pipeline: AZ proposals -> FRCNN -> per-class NMS.

    Returns ``all_boxes[cls][img] = [N, 5]`` (the reference's detection
    cache structure; optionally pickled like the reference's
    ``detections.pkl``).
    """
    cfg = frcnn_net.cfg
    n = min(imdb.num_images, max_images or imdb.num_images)
    num_classes = cfg.MODEL.NUM_CLASSES
    max_per_image = max_per_image or cfg.TEST.MAX_PER_IMAGE
    all_boxes = [[np.zeros((0, 5), np.float32) for _ in range(n)]
                 for _ in range(num_classes)]
    for i in range(n):
        entry = imdb.roidb[i]
        im = imdb.image_array(entry)
        dets = im_propose(az_net, im)
        if dets.shape[0] == 0:
            continue
        scores, boxes = im_detect(frcnn_net, im, dets[:, :4])
        _store_image_dets(all_boxes, i, scores, boxes, cfg, num_classes,
                          max_per_image)
    if cache_file:
        os.makedirs(os.path.dirname(cache_file) or ".", exist_ok=True)
        with open(cache_file, "wb") as f:
            pickle.dump(all_boxes, f)
    return all_boxes


def _store_image_dets(all_boxes, i, scores, boxes, cfg, num_classes,
                      max_per_image):
    """Per-class threshold + NMS + per-image cap (reference test-loop tail)."""
    for c in range(1, num_classes):
        keep = scores[:, c] > cfg.TEST.SCORE_THRESH
        cls_dets = np.concatenate(
            [boxes[keep, 4 * c : 4 * c + 4], scores[keep, c : c + 1]], axis=1
        ).astype(np.float32)
        if cls_dets.shape[0]:
            cls_dets = cls_dets[nms(cls_dets, cfg.TEST.NMS,
                                    offset=cfg.BOX_OFFSET)]
        all_boxes[c][i] = cls_dets
    # Global per-image cap (reference max_per_image logic).
    if max_per_image > 0:
        all_scores = np.concatenate(
            [all_boxes[c][i][:, 4] for c in range(1, num_classes)]
        )
        if all_scores.shape[0] > max_per_image:
            thresh = np.sort(all_scores)[-max_per_image]
            for c in range(1, num_classes):
                keep = all_boxes[c][i][:, 4] >= thresh
                all_boxes[c][i] = all_boxes[c][i][keep]


def detect_all_batched(az_net: Net, frcnn_net: Net, imdb,
                       batch_size: int = 16,
                       max_images: Optional[int] = None,
                       max_per_image: Optional[int] = None,
                       cache_file: Optional[str] = None,
                       verbose: bool = False,
                       fused: Optional[bool] = None):
    """Batched full pipeline: batched AZ propose -> batched FRCNN detect.

    Same ``all_boxes`` semantics as :func:`detect_all`, but images are
    canvas-bucketed and zero-padded so each bucket compiles once and every
    device call carries a full batch — the per-image loop pays a host
    round-trip per image, which dominates on remote backends.

    ``fused=None`` auto-selects the single-program shared-trunk pipeline
    (:func:`detect_all_fused`) when the two nets share trunk params —
    one trunk forward instead of two, identical results.
    """
    import jax
    import jax.numpy as jnp

    from aznet_tpu.api import make_detect_batch_padded, _canvas_for, \
        trunks_shared
    from aznet_tpu.ops.preprocess import compute_scale

    if fused is None:
        # Auto-fuse needs identical math, not just shared trunk weights:
        # the fused program preprocesses once with the AZ TEST config while
        # the two-program path builds the detect blob from the FRCNN one —
        # differing scales would silently run the head at the wrong scale.
        fused = (trunks_shared(az_net, frcnn_net)
                 and _test_cfgs_compatible(az_net.cfg, frcnn_net.cfg))
    if fused:
        return detect_all_fused(az_net, frcnn_net, imdb,
                                batch_size=batch_size, max_images=max_images,
                                max_per_image=max_per_image,
                                cache_file=cache_file, verbose=verbose)

    cfg = frcnn_net.cfg
    n = min(imdb.num_images, max_images or imdb.num_images)
    num_classes = cfg.MODEL.NUM_CLASSES
    max_per_image = max_per_image or cfg.TEST.MAX_PER_IMAGE
    all_boxes = [[np.zeros((0, 5), np.float32) for _ in range(n)]
                 for _ in range(num_classes)]

    proposals = propose_all_batched(az_net, imdb, batch_size=batch_size,
                                    max_images=n, verbose=verbose)
    r_pad = max(int(az_net.cfg.SEAR.NUM_PROPOSALS), 1)

    rup = lambda v, m=32: int(-(-v // m) * m)
    buckets: dict = {}
    for i in range(n):
        e = imdb.roidb[i]
        buckets.setdefault(_canvas_for(e["height"], e["width"], cfg), []).append(i)
    for canvas, idxs in buckets.items():
        hp = rup(max(imdb.roidb[i]["height"] for i in idxs))
        wp = rup(max(imdb.roidb[i]["width"] for i in idxs))
        key = ("detect_batched", canvas, hp, wp, batch_size, r_pad)
        fn = frcnn_net.get_jit(key, lambda: jax.jit(
            make_detect_batch_padded(frcnn_net.model, cfg, canvas)))
        for start in range(0, len(idxs), batch_size):
            chunk = idxs[start : start + batch_size]
            ims = np.zeros((batch_size, hp, wp, 3), np.float32)
            src_hw = np.zeros((batch_size, 2), np.float32)
            scales = np.ones((batch_size,), np.float32)
            boxes_in = np.zeros((batch_size, r_pad, 4), np.float32)
            n_props = np.zeros(batch_size, np.int32)
            for j, i in enumerate(chunk):
                im = imdb.image_array(imdb.roidb[i])
                ims[j, : im.shape[0], : im.shape[1]] = im
                src_hw[j] = (im.shape[0], im.shape[1])
                scales[j] = compute_scale(im.shape[0], im.shape[1],
                                          cfg.TEST.SCALES[0], cfg.TEST.MAX_SIZE)
                p = proposals[i][:r_pad, :4]
                boxes_in[j, : p.shape[0]] = p
                n_props[j] = p.shape[0]
            if len(chunk) < batch_size:
                src_hw[len(chunk):] = src_hw[len(chunk) - 1]
                scales[len(chunk):] = scales[len(chunk) - 1]
            scores, pred = fn(frcnn_net.params, jnp.asarray(ims),
                              jnp.asarray(src_hw), jnp.asarray(scales),
                              jnp.asarray(boxes_in))
            scores, pred = np.asarray(scores), np.asarray(pred)
            for j, i in enumerate(chunk):
                k = int(n_props[j])
                if k == 0:
                    continue
                _store_image_dets(all_boxes, i, scores[j][:k], pred[j][:k],
                                  cfg, num_classes, max_per_image)
    if cache_file:
        os.makedirs(os.path.dirname(cache_file) or ".", exist_ok=True)
        with open(cache_file, "wb") as f:
            pickle.dump(all_boxes, f)
    return all_boxes


def _test_cfgs_compatible(cfg_az, cfg_frcnn) -> bool:
    """True iff the fused single-preprocess program is numerically
    equivalent to the two-program path (same blob geometry)."""
    return (tuple(cfg_az.TEST.SCALES) == tuple(cfg_frcnn.TEST.SCALES)
            and cfg_az.TEST.MAX_SIZE == cfg_frcnn.TEST.MAX_SIZE)


def detect_all_fused(az_net: Net, frcnn_net: Net, imdb,
                     batch_size: int = 16,
                     max_images: Optional[int] = None,
                     max_per_image: Optional[int] = None,
                     cache_file: Optional[str] = None,
                     verbose: bool = False):
    """Shared-trunk end-to-end detection: ONE program per canvas bucket
    runs trunk -> AZ search -> FRCNN head (api.make_fused_detect_batch_
    padded). Requires ``trunks_shared(az_net, frcnn_net)``.
    """
    import jax
    import jax.numpy as jnp

    from aznet_tpu.api import (_canvas_for, make_fused_detect_batch_padded,
                               trunks_shared)
    from aznet_tpu.ops.preprocess import compute_scale
    from aznet_tpu.utils.timer import Timer

    if not trunks_shared(az_net, frcnn_net):
        raise ValueError("detect_all_fused needs share_trunk'd nets "
                         "(identical trunk params)")
    if not _test_cfgs_compatible(az_net.cfg, frcnn_net.cfg):
        raise ValueError(
            "detect_all_fused preprocesses ONCE with the AZ TEST config; "
            f"FRCNN TEST geometry differs (AZ {az_net.cfg.TEST.SCALES}/"
            f"{az_net.cfg.TEST.MAX_SIZE} vs FRCNN {frcnn_net.cfg.TEST.SCALES}"
            f"/{frcnn_net.cfg.TEST.MAX_SIZE}) — results would not match the "
            "two-program path")
    cfg = frcnn_net.cfg
    cfg_az = az_net.cfg
    n = min(imdb.num_images, max_images or imdb.num_images)
    num_classes = cfg.MODEL.NUM_CLASSES
    max_per_image = max_per_image or cfg.TEST.MAX_PER_IMAGE
    all_boxes = [[np.zeros((0, 5), np.float32) for _ in range(n)]
                 for _ in range(num_classes)]

    rup = lambda v, m=32: int(-(-v // m) * m)
    buckets: dict = {}
    for i in range(n):
        e = imdb.roidb[i]
        buckets.setdefault(_canvas_for(e["height"], e["width"], cfg_az),
                           []).append(i)
    timer = Timer()
    for canvas, idxs in buckets.items():
        hp = rup(max(imdb.roidb[i]["height"] for i in idxs))
        wp = rup(max(imdb.roidb[i]["width"] for i in idxs))
        key = ("detect_fused", canvas, hp, wp, batch_size)
        fn = az_net.get_jit(key, lambda: jax.jit(
            make_fused_detect_batch_padded(az_net.model, frcnn_net.model,
                                           cfg_az, cfg, canvas)))
        for start in range(0, len(idxs), batch_size):
            chunk = idxs[start : start + batch_size]
            ims = np.zeros((batch_size, hp, wp, 3), np.float32)
            src_hw = np.zeros((batch_size, 2), np.float32)
            scales = np.ones((batch_size,), np.float32)
            for j, i in enumerate(chunk):
                im = imdb.image_array(imdb.roidb[i])
                ims[j, : im.shape[0], : im.shape[1]] = im
                src_hw[j] = (im.shape[0], im.shape[1])
                scales[j] = compute_scale(im.shape[0], im.shape[1],
                                          cfg_az.TEST.SCALES[0],
                                          cfg_az.TEST.MAX_SIZE)
            if len(chunk) < batch_size:
                src_hw[len(chunk):] = src_hw[len(chunk) - 1]
                scales[len(chunk):] = scales[len(chunk) - 1]
            timer.tic()
            _, _, valid, scores, pred = jax.device_get(
                fn(az_net.params, frcnn_net.params, jnp.asarray(ims),
                   jnp.asarray(src_hw), jnp.asarray(scales)))
            t = timer.toc()
            if verbose:
                print(f"# fused batch of {len(chunk)} "
                      f"(canvas {canvas}) {t / batch_size * 1000:.1f} ms/img")
            for j, i in enumerate(chunk):
                k = int(valid[j].sum())
                if k == 0:
                    continue
                _store_image_dets(all_boxes, i, scores[j][:k], pred[j][:k],
                                  cfg, num_classes, max_per_image)
    if cache_file:
        os.makedirs(os.path.dirname(cache_file) or ".", exist_ok=True)
        with open(cache_file, "wb") as f:
            pickle.dump(all_boxes, f)
    return all_boxes
