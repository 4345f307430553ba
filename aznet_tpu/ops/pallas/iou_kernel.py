"""Tiled IoU matrix as a Pallas kernel.

Reference equivalent: the Cython ``bbox_overlaps`` (SURVEY.md §2.3). The
broadcast jnp version (ops/iou.py) materializes [N, K] intermediates per
coordinate in HBM for large problems; this kernel computes each (128, 128)
output tile entirely in VMEM/registers from two coordinate strips — the
label-assignment workhorse for very large N*K (dense anchor matching,
recall grids over whole datasets).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_N = 128
TILE_K = 128


def _iou_tile_kernel(offset, rows_ref, cols_ref, out_ref):
    # rows_ref: (TILE_N, 4) sublane layout; cols_ref: (4, TILE_K) lane layout.
    rx1 = rows_ref[:, pl.ds(0, 1)]
    ry1 = rows_ref[:, pl.ds(1, 1)]
    rx2 = rows_ref[:, pl.ds(2, 1)]
    ry2 = rows_ref[:, pl.ds(3, 1)]
    cx1 = cols_ref[pl.ds(0, 1), :]
    cy1 = cols_ref[pl.ds(1, 1), :]
    cx2 = cols_ref[pl.ds(2, 1), :]
    cy2 = cols_ref[pl.ds(3, 1), :]
    iw = jnp.minimum(rx2, cx2) - jnp.maximum(rx1, cx1) + offset
    ih = jnp.minimum(ry2, cy2) - jnp.maximum(ry1, cy1) + offset
    inter = jnp.maximum(iw, 0.0) * jnp.maximum(ih, 0.0)
    area_r = (rx2 - rx1 + offset) * (ry2 - ry1 + offset)
    area_c = (cx2 - cx1 + offset) * (cy2 - cy1 + offset)
    union = area_r + area_c - inter
    out_ref[:, :] = jnp.where(union > 0, inter / union, 0.0)


def bbox_overlaps_pallas(boxes, query_boxes, offset: float = 1.0,
                         interpret: bool = False):
    """IoU matrix [N, K] via 128x128 VMEM tiles (TPU). Same semantics as
    :func:`aznet_tpu.ops.iou.bbox_overlaps`."""
    n, k = boxes.shape[0], query_boxes.shape[0]
    n_pad = int(-(-n // TILE_N) * TILE_N)
    k_pad = int(-(-k // TILE_K) * TILE_K)
    rows = jnp.pad(boxes.astype(jnp.float32), ((0, n_pad - n), (0, 0)))
    cols = jnp.pad(query_boxes.astype(jnp.float32), ((0, k_pad - k), (0, 0))).T

    out = pl.pallas_call(
        partial(_iou_tile_kernel, offset),
        grid=(n_pad // TILE_N, k_pad // TILE_K),
        in_specs=[
            pl.BlockSpec((TILE_N, 4), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, TILE_K), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE_N, TILE_K), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, k_pad), jnp.float32),
        interpret=interpret,
    )(rows, cols)
    return out[:n, :k]
