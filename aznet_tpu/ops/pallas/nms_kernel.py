"""Tiled greedy NMS as a single Pallas kernel.

Reference equivalent: ``lib/utils/nms.pyx`` (SURVEY.md §2.3) — the host
Cython greedy loop; the BASELINE "NMS Mboxes/sec" metric targets exactly
this op. The pure-JAX ``nms_mask`` (ops/nms.py) is exact but fixpoint-
iterative: it materializes the (N, N) IoU matrix in HBM and re-reduces it
every iteration. This kernel computes greedy NMS in ONE pass by exploiting
the TPU's sequential grid:

  grid step i (one 128-box tile, score-descending order):
    1. cross-tile suppression: IoU(tile_i, tile_j) against every EARLIER
       tile j, masked by tile_j's already-final keep row (read back from the
       output ref — TPU grids execute in order, so outputs double as carry
       state).
    2. within-tile sequential greedy over the 128 boxes (vector ops on the
       (1, 128) lane row).
    3. write keep row i.

All IoU tiles live in VMEM; nothing is ever re-computed or re-read from HBM.
Work is O(N^2/2) VPU flops + N tiny sequential steps, vs O(N^2 * depth) for
the fixpoint.
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 128


def _tile_coords(ref, j):
    """Load one (1, TILE) coordinate row for tile j from a (1, N) ref."""
    return ref[:, pl.ds(j * TILE, TILE)]


def _iou_tiles(a, b, offset):
    """IoU between tile a (rows) and tile b (cols): (1,T)x4 -> (T,T)."""
    ax1, ay1, ax2, ay2 = a
    bx1, by1, bx2, by2 = b
    # rows: a boxes -> (T, 1); cols: b boxes -> (1, T)
    ax1 = ax1.reshape(TILE, 1)
    ay1 = ay1.reshape(TILE, 1)
    ax2 = ax2.reshape(TILE, 1)
    ay2 = ay2.reshape(TILE, 1)
    iw = jnp.minimum(ax2, bx2) - jnp.maximum(ax1, bx1) + offset
    ih = jnp.minimum(ay2, by2) - jnp.maximum(ay1, by1) + offset
    inter = jnp.maximum(iw, 0.0) * jnp.maximum(ih, 0.0)
    area_a = (ax2 - ax1 + offset) * (ay2 - ay1 + offset)
    area_b = (bx2 - bx1 + offset) * (by2 - by1 + offset)
    union = area_a + area_b - inter
    return jnp.where(union > 0, inter / union, 0.0)


def _nms_kernel(offset, thresh_ref, x1_ref, y1_ref, x2_ref, y2_ref,
                valid_ref, keep_ref, iou_scr, supp_scr):
    i = pl.program_id(0)
    t = thresh_ref[0, 0]

    tile_i = tuple(_tile_coords(r, i) for r in (x1_ref, y1_ref, x2_ref, y2_ref))
    valid_i = valid_ref[:, pl.ds(i * TILE, TILE)]  # (1, T)

    # 1) cross-tile suppression from all earlier (finalized) tiles.
    def prev_body(j, supp):
        tile_j = tuple(_tile_coords(r, j) for r in (x1_ref, y1_ref, x2_ref, y2_ref))
        iou = _iou_tiles(tile_i, tile_j, offset)  # (T, T): rows=i, cols=j
        keep_j = keep_ref[pl.ds(j, 1), :]  # (1, T)
        hit = jnp.max(jnp.where((iou > t) & (keep_j > 0.0), 1.0, 0.0),
                      axis=1, keepdims=True)  # (T, 1)
        return jnp.maximum(supp, hit.reshape(1, TILE))

    supp = jax.lax.fori_loop(0, i, prev_body, jnp.zeros((1, TILE), jnp.float32))
    supp_scr[:, :] = supp

    # 2) within-tile sequential greedy. Mosaic has no dynamic_slice on
    #    VALUES, so the loop state and IoU matrix live in VMEM scratch refs
    #    (ref dynamic indexing lowers fine).
    iou_scr[:, :] = _iou_tiles(tile_i, tile_i, offset)  # (T, T)
    col = jax.lax.broadcasted_iota(jnp.int32, (1, TILE), 1)

    def inner_body(k, _):
        # Scalar reads at a dynamic LANE offset don't lower on TPU; extract
        # via one-hot reductions instead (pure VPU work).
        onehot = (col == k).astype(jnp.float32)  # (1, T)
        supp_k = jnp.sum(supp_scr[:, :] * onehot)
        valid_k = jnp.sum(valid_i * onehot)
        alive_k = (1.0 - supp_k) * valid_k  # scalar
        row_k = iou_scr[pl.ds(k, 1), :]  # (1, T) dynamic SUBLANE slice: OK
        hit = jnp.where((row_k > t) & (col > k), alive_k, 0.0)
        supp_scr[:, :] = jnp.maximum(supp_scr[:, :], hit)
        return 0

    jax.lax.fori_loop(0, TILE, inner_body, 0)

    # 3) finalize this tile's keep row.
    keep_ref[pl.ds(i, 1), :] = jnp.where(valid_i > 0.0, 1.0 - supp_scr[:, :], 0.0)


def nms_pallas(boxes, scores, thresh, valid=None, offset: float = 1.0,
               interpret: bool = False):
    """Exact greedy-NMS keep mask in ORIGINAL order (Pallas TPU kernel).

    Same semantics as :func:`aznet_tpu.ops.nms.nms_mask`. ``interpret=True``
    runs the kernel in the Pallas interpreter (CPU tests).
    """
    n = boxes.shape[0]
    if valid is None:
        valid = jnp.ones((n,), bool)
    neg_inf = jnp.asarray(-jnp.inf, scores.dtype)
    s = jnp.where(valid, scores, neg_inf)
    order = jnp.argsort(-s, stable=True)
    sboxes = boxes[order].astype(jnp.float32)
    svalid = valid[order]

    n_pad = int(-(-n // TILE) * TILE)
    num_tiles = n_pad // TILE
    pad = n_pad - n
    sboxes = jnp.pad(sboxes, ((0, pad), (0, 0)))
    svalid_f = jnp.pad(svalid.astype(jnp.float32), (0, pad))

    coords = [sboxes[:, c].reshape(1, n_pad) for c in range(4)]
    thresh_arr = jnp.asarray(thresh, jnp.float32).reshape(1, 1)

    keep_rows = pl.pallas_call(
        partial(_nms_kernel, offset),
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ] + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 5,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((num_tiles, TILE), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((TILE, TILE), jnp.float32),
            pltpu.VMEM((1, TILE), jnp.float32),
        ],
        interpret=interpret,
    )(thresh_arr, *coords, svalid_f.reshape(1, n_pad))

    keep_sorted = keep_rows.reshape(n_pad)[:n] > 0.0
    return jnp.zeros((n,), bool).at[order].set(keep_sorted)
