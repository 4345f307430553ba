"""Fused ROI-align as a Pallas kernel.

Reference equivalent: the CUDA ROIPooling layer (SURVEY.md §2.3). The XLA
path (ops/roi_pool.py::roi_align) is already MXU matmuls, but materializes
the [R, P, W, C] row-interpolated intermediate in HBM between the two
contractions. This kernel keeps the feature map, the per-roi interpolation
weights AND the intermediate entirely in VMEM: one grid step processes one
image's roi tile end-to-end.

Semantics are identical to roi_align(sampling=s, offset=o): triangle-kernel
bilinear weights averaged over s samples per bin (see
ops/roi_pool.py::_bilinear_pool_weights), average pooling.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _weights(lo, size, extent, pool, sampling):
    """[TILE_R, pool, extent] separable weights (in-kernel, VPU)."""
    n = pool * sampling
    # Mosaic's iota is integer-only; cast after.
    grid = (jax.lax.broadcasted_iota(jnp.int32, (1, n), 1).astype(jnp.float32)
            + 0.5) / n  # (1, n)
    pos = lo + grid * size  # [R, n] via broadcast: lo/size are (R, 1)
    pos = jnp.clip(pos, 0.0, extent - 1.0)
    cells = jax.lax.broadcasted_iota(jnp.int32, (1, extent), 1).astype(jnp.float32)
    w = jnp.maximum(1.0 - jnp.abs(pos[:, :, None] - cells[None]), 0.0)  # [R,n,E]
    r = pos.shape[0]
    return w.reshape(r, pool, sampling, extent).mean(axis=2)  # [R,pool,E]


def _roi_align_kernel(spatial_scale, pool, sampling, offset,
                      feat_ref, rois_ref, out_ref):
    h = feat_ref.shape[0]
    w = feat_ref.shape[1]
    c = feat_ref.shape[2]
    tile_r = rois_ref.shape[0]

    x1 = rois_ref[:, pl.ds(0, 1)] * spatial_scale - offset  # (R, 1)
    y1 = rois_ref[:, pl.ds(1, 1)] * spatial_scale - offset
    x2 = rois_ref[:, pl.ds(2, 1)] * spatial_scale - offset
    y2 = rois_ref[:, pl.ds(3, 1)] * spatial_scale - offset
    roi_w = jnp.maximum(x2 - x1, 1.0)
    roi_h = jnp.maximum(y2 - y1, 1.0)

    wy = _weights(y1, roi_h, h, pool, sampling)  # [R, P, H]
    wx = _weights(x1, roi_w, w, pool, sampling)  # [R, P, W]

    feat = feat_ref[:, :, :]  # [H, W, C] in VMEM (compute dtype)
    # rows[r, p, w, c] = sum_h wy[r, p, h] feat[h, w, c]; keep the
    # intermediate in the feature dtype (bf16) — f32 blows the VMEM budget
    # (and matches the XLA roi_align, which also re-casts between passes).
    rows = jax.lax.dot_general(
        wy.reshape(tile_r * pool, h).astype(feat.dtype),
        feat.reshape(h, w * c),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(feat.dtype).reshape(tile_r, pool, w, c)
    # out[r, p, q, c] = sum_w wx[r, q, w] rows[r, p, w, c]
    out = jax.lax.dot_general(
        wx.astype(feat.dtype), rows,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # [R, Pq, Pp, C] with batch dim first: dims (r, q, p, c)
    out_ref[:, :, :, :] = jnp.transpose(out, (0, 2, 1, 3)).astype(out_ref.dtype)


def roi_align_pallas(feat, rois, spatial_scale: float, pool_size: int = 7,
                     sampling: int = 2, offset: float = 0.0,
                     tile_r: int = 16, interpret: bool = False):
    """Fused ROI align: feat [H, W, C], rois [R, 4] -> [R, P, P, C]."""
    h, w, c = feat.shape
    r = rois.shape[0]
    r_pad = int(-(-r // tile_r) * tile_r)
    rois_p = jnp.pad(rois.astype(jnp.float32), ((0, r_pad - r), (0, 0)))

    out = pl.pallas_call(
        partial(_roi_align_kernel, spatial_scale, pool_size, sampling, offset),
        grid=(r_pad // tile_r,),
        in_specs=[
            pl.BlockSpec((h, w, c), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_r, 4), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_r, pool_size, pool_size, c),
                               lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((r_pad, pool_size, pool_size, c), feat.dtype),
        interpret=interpret,
    )(feat, rois_p)
    return out[:r]
