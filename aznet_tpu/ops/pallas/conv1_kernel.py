"""Fused VGG conv1 tail (conv1_2 + ReLU + pool1) Pallas kernel.

Reference equivalent: the first VGG-16 block of the prototxt trunk
(SURVEY.md §2.1), Caffe runs it as separate cuDNN calls. Under XLA the
block's 64-channel activations at 608x800 (~62 MB/image) cross HBM five
times (conv1_1-write, conv1_2-read/write, pool-read/write) — ~6.5 GB per
32-image batch, making the block the trunk's HBM hot spot at ~35 TF/s
effective while mid blocks run at 130-180 TF/s.

``fused_conv1_pool`` runs conv1_1 (+bias+ReLU) through XLA — its 3-channel
input needs lane-splitting reshapes Mosaic does not support ("infer-vector-
layout: unsupported shape cast" when building K=27 patches in-kernel) —
then a Pallas kernel computes conv1_2 + ReLU + 2x2 max pool per 32-row
strip entirely in VMEM: each strip DMAs [TILE+2, W+2, C] of the pre-padded
conv1_1 output, accumulates the 9 taps as [TILE*W, C] x [C, C] MXU matmuls
in f32, pools, and writes only the [TILE/2, W/2, C] result. conv1_2's
intermediate and the pool input never exist in HBM (block traffic ~6.5 GB
-> ~4.5 GB/batch) and the pool costs no extra pass.

MEASURED RESULT (v5e, batch 32 at 608x800): the fused path is SLOWER than
XLA's convolutions (169 vs 122 ms/batch end-to-end propose) — the
lane-alignment channel padding doubles strip read traffic and the TILE=8
strips (forced by the 16 MB VMEM budget) leave the MXU underfed, which
costs more than the saved intermediate round-trips. Kept as a correct,
tested native-kernel reference and for future int8 variants (where the
arithmetic-intensity math changes); MODEL.FUSE_CONV1 stays off by default.

Inference-path only (no custom VJP); training keeps the XLA convolutions.
vmap-safe via a custom_vmap rule that folds batch axes into the kernel's
own batch grid (the default pallas batching rule would block the ANY-space
input, which the TPU lowering rejects).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 8  # pre-pool rows per grid step
LANE = 128  # channel dim padded to full lanes (DMA slices need 128-aligned lanes)


def _kernel(W, C, ypad_hbm, w12_ref, b12_ref, out_ref, ys, sem):
    bi = pl.program_id(0)
    i = pl.program_id(1)

    # Strip DMA: TILE+2 padded rows of this image's conv1_1 output. The
    # input stays in HBM as ONE unblocked array (TPU lowering requires
    # trivial specs for ANY-space refs); batch/strip indexing happens here.
    # Channels ride zero-padded to LANE=128 (Mosaic DMA slices need
    # 128-aligned lanes); the K=128 tap matmuls cost the same MXU time as
    # K=C would (the systolic array is 128 deep either way).
    dma = pltpu.make_async_copy(
        ypad_hbm.at[bi, pl.ds(i * TILE, TILE + 2), :, :], ys, sem)
    dma.start()
    dma.wait()

    # conv1_2: 9 taps as [TILE*W, LANE] x [LANE, C] matmuls, f32 accumulate.
    acc = jnp.zeros((TILE * W, C), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            sl = ys[dy:dy + TILE, dx:dx + W, :].reshape(TILE * W, LANE)
            acc = acc + jnp.dot(sl, w12_ref[3 * dy + dx],
                                preferred_element_type=jnp.float32)
    acc = jnp.maximum(acc + b12_ref[:], 0.0)

    # pool1: 2x2/2 max -> [TILE/2, W/2, C], write the output block.
    p = acc.reshape(TILE // 2, 2, W // 2, 2, C)
    p = jnp.max(jnp.max(p, axis=3), axis=1)
    out_ref[0] = p.astype(out_ref.dtype)


def _fused_impl(y, w12, b12, interpret: bool):
    b, h, w, c = y.shape
    assert h % TILE == 0 and w % 2 == 0, (h, w)
    dt = y.dtype

    # conv1_2 SAME pad; right-pad W to a multiple of 8 and C to LANE=128
    # (Mosaic DMA alignment) — the zero columns/channels contribute nothing.
    wp = -(-(w + 2) // 8) * 8
    ypad = jnp.pad(y, ((0, 0), (1, 1), (1, wp - w - 1), (0, LANE - c)))
    w12r = jnp.pad(w12.reshape(9, c, c), ((0, 0), (0, LANE - c), (0, 0))
                   ).astype(dt)
    b12r = b12.reshape(1, c).astype(jnp.float32)

    out = pl.pallas_call(
        partial(_kernel, w, c),
        grid=(b, h // TILE),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # whole array, in HBM
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, TILE // 2, w // 2, c),
                               lambda bi, i: (bi, i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, h // 2, w // 2, c), dt),
        scratch_shapes=[
            pltpu.VMEM((TILE + 2, wp, LANE), dt),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(ypad, w12r, b12r)
    return out


def _make_fused(interpret: bool):
    @jax.custom_batching.custom_vmap
    def fused(y, w12, b12):
        return _fused_impl(y, w12, b12, interpret)

    @fused.def_vmap
    def _vmap_rule(axis_size, in_batched, y, w12, b12):
        if any(in_batched[1:]):
            raise NotImplementedError("batched conv1 weights")
        if not in_batched[0]:
            return fused(y, w12, b12), False
        vb, b, h, w, c = y.shape
        out = fused(y.reshape(vb * b, h, w, c), w12, b12)
        return out.reshape((vb, b) + out.shape[1:]), True

    return fused


_FUSED_TPU = _make_fused(False)
_FUSED_INTERP = _make_fused(True)


def fused_conv1_pool(x, w11, b11, w12, b12, interpret: bool = False):
    """conv1_1 -> ReLU (XLA) -> fused conv1_2 -> ReLU -> 2x2 max pool.

    ``x``: [B, H, W, 3] (any float dtype; computed in bf16 on TPU),
    ``w11`` [3, 3, 3, C] HWIO, ``w12`` [3, 3, C, C] HWIO. Returns
    [B, H//2, W//2, C] in ``x``'s dtype. H % 32 == 0 and W % 2 == 0
    required (framework canvases are multiples of 32). vmap-safe.
    """
    dn = jax.lax.conv_dimension_numbers(x.shape, w11.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    y = jax.lax.conv_general_dilated(x, w11.astype(x.dtype), (1, 1), "SAME",
                                     dimension_numbers=dn)
    y = jnp.maximum(y + b11.astype(x.dtype), 0)
    return (_FUSED_INTERP if interpret else _FUSED_TPU)(y, w12, b12)
