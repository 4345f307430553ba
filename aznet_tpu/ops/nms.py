"""Non-maximum suppression: host oracle + on-device exact greedy NMS.

Reference equivalent (SURVEY.md §2.3): the Cython CPU greedy NMS in
``lib/utils/nms.pyx`` (+ pure-Python ``nms.py`` fallback) — inherently
sequential host code, one box at a time. The TPU-native design:

- ``nms``        — host NumPy greedy, bit-parity oracle for eval/tests
                   (C++ fast path via aznet_tpu.utils.native when built).
- ``nms_jax``    — exact greedy NMS on device, formulated as an antitone
                   fixpoint over the suppression matrix: ``keep =
                   ~any(S & keep)`` iterated to convergence. Each iteration
                   is one masked (N,N) reduction (VPU-friendly); iterations
                   needed = depth of the suppression DAG (typically < 8),
                   bounded by N. Fully jit/vmap-able, static shapes.
- ``nms_topk``   — nms_jax + top-k extraction with padding, for pipelines.

A Pallas-tiled variant for very large N lives in
``aznet_tpu.ops.pallas.nms_kernel`` (the BASELINE "NMS Mboxes/sec" metric).

Convention notes (parity with the reference): "+1" areas via ``offset``;
suppression is strict ``IoU > thresh`` (the Cython code keeps ``ovr <=
thresh``); ties in score are broken toward the lower original index (the
reference's unstable quicksort makes ties platform-defined — tests use
distinct scores).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from aznet_tpu.ops.iou import bbox_overlaps


# ---------------------------------------------------------------------------
# Host oracle (reference lib/utils/nms.py semantics)
# ---------------------------------------------------------------------------


def nms(dets: np.ndarray, thresh: float, offset: float = 1.0) -> list:
    """Greedy NMS over ``dets [N, 5] = [x1, y1, x2, y2, score]`` on host.

    Returns the list of kept indices, highest score first — the same
    signature and semantics as the reference's ``nms(dets, thresh)``.
    Uses the C++ library (csrc/) when built, NumPy otherwise.
    """
    if dets.size == 0:
        return []
    from aznet_tpu.utils import native

    if native.available():
        return native.nms(np.asarray(dets), thresh, offset)
    x1, y1, x2, y2 = dets[:, 0], dets[:, 1], dets[:, 2], dets[:, 3]
    scores = dets[:, 4]
    areas = (x2 - x1 + offset) * (y2 - y1 + offset)
    order = np.argsort(-scores, kind="stable")
    keep = []
    while order.size > 0:
        i = order[0]
        keep.append(int(i))
        xx1 = np.maximum(x1[i], x1[order[1:]])
        yy1 = np.maximum(y1[i], y1[order[1:]])
        xx2 = np.minimum(x2[i], x2[order[1:]])
        yy2 = np.minimum(y2[i], y2[order[1:]])
        w = np.maximum(0.0, xx2 - xx1 + offset)
        h = np.maximum(0.0, yy2 - yy1 + offset)
        inter = w * h
        ovr = inter / (areas[i] + areas[order[1:]] - inter)
        order = order[1:][ovr <= thresh]
    return keep


# ---------------------------------------------------------------------------
# On-device exact greedy NMS
# ---------------------------------------------------------------------------


def _pallas_profitable(n: int) -> bool:
    """Use the Pallas kernel on real TPUs for large N.

    The fixpoint's cost is data-dependent (iterations = suppression-DAG
    depth): measured 128 ms vs 7 ms for the kernel on 32x2048 diverse boxes
    (worst case), near-equal on degenerate boxes. Below ~2 tiles the padding
    overhead eats the win; off-TPU the kernel would run interpreted.
    """
    try:
        backend_is_tpu = jax.default_backend() == "tpu"
    except RuntimeError:  # backend not initialized / unavailable
        backend_is_tpu = False
    return backend_is_tpu and n >= 512


def nms_mask(boxes, scores, iou_threshold, valid=None, offset: float = 1.0,
             impl: str = "auto", order_mode: "str | None" = None):
    """Exact greedy-NMS keep mask, in the ORIGINAL box order.

    ``boxes [N, 4]``, ``scores [N]``, optional ``valid [N]`` bool mask for
    padded inputs. Returns ``keep [N]`` bool. jit/vmap-safe, static shapes.

    ``impl``: 'auto' (Pallas kernel on TPU for N >= 512, else the fixpoint),
    'fixpoint', or 'pallas'. Both are exact greedy (tested equal).
    ``order_mode`` (pallas impl): 'argsort' | 'intkey' | 'bitonic' — how
    the score-descending permutation is derived (identical keep sets AND
    identical order, hardware-pinned by tpu_checks
    nms_{intkey,bitonic}_vs_argsort_order; the XLA-side sort is ~2/3 of
    the wrapper cost at serving shapes, DESIGN findings 20/23/28).
    Default: env ``AZNET_NMS_ORDER`` or 'bitonic' — ordering happens
    inside a Pallas kernel (a bitonic network over (intkey, index) pairs
    carrying the coordinate planes), measured 36.2 vs intkey's 22.1
    Mboxes/s at 16x4096 (finding 28); float64 scores fall back to the
    stable argsort inside the kernel wrapper to keep the order contract.
    NOTE: the env var is read at TRACE time — a jitted caller captures it
    per jit cache entry, so flipping ``AZNET_NMS_ORDER`` after a program
    has compiled does not affect that compiled program (clear the jit
    cache or pass ``order_mode`` explicitly to A/B inside one process).

    Fixpoint algorithm: sort by score desc; build the strict-lower-triangular
    suppression matrix ``S[i, j] = (j < i) & (IoU > t)``; iterate the
    antitone map ``keep <- ~any_j(S[:, j] & keep[j])`` from all-ones until
    fixpoint. By induction on sorted order the fixpoint is exactly the
    greedy solution; convergence takes at most the suppression-DAG depth
    iterations (bounded by N).
    """
    n = boxes.shape[0]
    if impl == "auto":
        impl = "pallas" if _pallas_profitable(n) else "fixpoint"
    if impl == "pallas":
        import os

        from aznet_tpu.ops.pallas.nms_kernel import nms_pallas

        if order_mode is None:
            order_mode = os.environ.get("AZNET_NMS_ORDER", "bitonic")
        return nms_pallas(boxes, scores, iou_threshold, valid=valid,
                          offset=offset, order_mode=order_mode)
    if valid is None:
        valid = jnp.ones((n,), dtype=bool)
    neg_inf = jnp.asarray(-jnp.inf, scores.dtype)
    s = jnp.where(valid, scores, neg_inf)
    order = jnp.argsort(-s, stable=True)
    sboxes = boxes[order]
    svalid = valid[order]

    iou = bbox_overlaps(sboxes, sboxes, offset=offset)
    tri = jnp.tril(jnp.ones((n, n), dtype=bool), k=-1)  # [i, j]: j before i
    supp = tri & (iou > iou_threshold) & svalid[None, :] & svalid[:, None]

    def cond(state):
        keep, prev_changed = state
        return prev_changed

    def body(state):
        keep, _ = state
        new_keep = ~jnp.any(supp & keep[None, :], axis=1) & svalid
        return new_keep, jnp.any(new_keep != keep)

    keep0 = svalid
    keep_sorted, _ = jax.lax.while_loop(cond, body, (keep0, jnp.asarray(True)))
    # Scatter back to original order.
    keep = jnp.zeros((n,), dtype=bool).at[order].set(keep_sorted)
    return keep


def nms_jax(dets, thresh, valid=None, offset: float = 1.0):
    """Device analogue of ``nms(dets, thresh)``: keep mask for [N,5] dets."""
    return nms_mask(dets[:, :4], dets[:, 4], thresh, valid=valid, offset=offset)


def nms_topk(boxes, scores, iou_threshold, k, valid=None, offset: float = 1.0):
    """NMS then top-k by score. Returns ``(boxes [k,4], scores [k], valid [k])``.

    Padded with zeros / -inf where fewer than k boxes survive. Static
    shapes — the on-device replacement for the reference's host
    "NMS then slice top-N" pattern in ``im_propose``.
    """
    keep = nms_mask(boxes, scores, iou_threshold, valid=valid, offset=offset)
    neg_inf = jnp.asarray(-jnp.inf, scores.dtype)
    kept_scores = jnp.where(keep, scores, neg_inf)
    k_eff = min(k, boxes.shape[0])  # fewer candidates than k: pad outputs
    top_scores, top_idx = jax.lax.top_k(kept_scores, k_eff)
    out_valid = top_scores > neg_inf
    out_boxes = jnp.where(out_valid[:, None], boxes[top_idx], 0.0)
    out_scores = jnp.where(out_valid, top_scores, 0.0)
    if k_eff < k:
        pad = k - k_eff
        out_boxes = jnp.pad(out_boxes, ((0, pad), (0, 0)))
        out_scores = jnp.pad(out_scores, (0, pad))
        out_valid = jnp.pad(out_valid, (0, pad))
    return out_boxes, out_scores, out_valid
