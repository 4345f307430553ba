"""Fused VGG conv1 block (conv1_1 + ReLU + conv1_2 + ReLU + pool1) kernel.

Reference equivalent: the first three layers of the VGG-16 prototxt trunk
(SURVEY.md §2.1) executed by Caffe as separate cuDNN calls. Under XLA they
are likewise separate convolutions, and at the 600-px detection scale this
block is the trunk's worst corner: the 64-channel activations at 608x800
are ~62 MB/image, so conv1_1-write + conv1_2-read/write + pool-read/write
moves ~6.5 GB of HBM per 32-image batch, and conv1_2's N=64 output width
wastes half the MXU lanes regardless. This kernel keeps the whole block in
VMEM per 32-row strip: HBM traffic drops to input-read + pooled-write
(~0.6 GB/batch) and the intermediate tensors never exist.

Shapes/layout:
  - input  [B, H, W, 3] (preprocessed blob); pre-padded + lane-flattened to
    [B, H+4, (W+4)*3] by the host wrapper so SAME-conv halos are plain
    static slices (3 lanes = 1 pixel).
  - grid (B, H/32): each step DMAs a 36-row strip, computes
    t1 = relu(conv1_1) for 34 rows x W+2 cols, accumulates the 9 conv1_2
    taps as [32*W, C] x [C, C] MXU matmuls in f32, then 2x2 max-pools and
    writes [16, W/2, C].
  - weights: w11 as [27, C] (tap-major (dy, dx, cin)), w12 as [9, C, C].

Requires H % 32 == 0 (the framework's canvases are multiples of 32).
Inference-path only (no custom VJP); training keeps the XLA convolutions.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 32  # pre-pool rows per grid step


def _kernel(W, C, xpad_hbm, w11_ref, b11_ref, w12_ref, b12_ref, out_ref,
            xs, sem):
    i = pl.program_id(1)

    # 1) strip DMA: 36 padded rows of this image (row i*TILE .. +36).
    dma = pltpu.make_async_copy(
        xpad_hbm.at[0, pl.ds(i * TILE, TILE + 4), :], xs, sem)
    dma.start()
    dma.wait()

    # 2) conv1_1 + ReLU on 34 rows x (W+2) cols (the halo conv1_2 needs).
    cols = W + 2
    taps = []
    for dy in range(3):
        for dx in range(3):
            sl = xs[dy:dy + TILE + 2, 3 * dx:3 * dx + 3 * cols]
            taps.append(sl.reshape(TILE + 2, cols, 3))
    patches = jnp.concatenate(taps, axis=-1).reshape((TILE + 2) * cols, 27)
    t1 = jnp.dot(patches, w11_ref[:], preferred_element_type=jnp.float32)
    t1 = jnp.maximum(t1 + b11_ref[:], 0.0)
    t1 = t1.reshape(TILE + 2, cols, C).astype(patches.dtype)
    # conv1_2's SAME padding zeroes t1 OUTSIDE the image; the halo rows/cols
    # computed here (original row i*TILE-1+j, col k-1) are real conv values
    # of the zero-padded input (= relu(b11) and edge terms), so mask them.
    h_img = pl.num_programs(1) * TILE
    row0 = i * TILE - 1
    rr = jax.lax.broadcasted_iota(jnp.int32, (TILE + 2, cols), 0) + row0
    cc = jax.lax.broadcasted_iota(jnp.int32, (TILE + 2, cols), 1) - 1
    inside = (rr >= 0) & (rr < h_img) & (cc >= 0) & (cc < W)
    t1 = jnp.where(inside[:, :, None], t1, 0)

    # 3) conv1_2: 9 taps as [TILE*W, C] x [C, C] matmuls, f32 accumulate.
    acc = jnp.zeros((TILE * W, C), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            sl = t1[dy:dy + TILE, dx:dx + W, :].reshape(TILE * W, C)
            acc = acc + jnp.dot(sl, w12_ref[3 * dy + dx],
                                preferred_element_type=jnp.float32)
    acc = jnp.maximum(acc + b12_ref[:], 0.0)

    # 4) pool1: 2x2/2 max -> [TILE/2, W/2, C], write the output block.
    p = acc.reshape(TILE // 2, 2, W // 2, 2, C)
    p = jnp.max(jnp.max(p, axis=3), axis=1)
    out_ref[0] = p.astype(out_ref.dtype)


def fused_conv1_pool(x, w11, b11, w12, b12, interpret: bool = False):
    """conv1_1 -> ReLU -> conv1_2 -> ReLU -> 2x2 max pool, fused.

    ``x``: [B, H, W, 3] (any float dtype; computed in bf16 on TPU),
    ``w11`` [3, 3, 3, C] HWIO, ``w12`` [3, 3, C, C] HWIO. Returns
    [B, H//2, W//2, C] in ``x``'s dtype. H % 32 == 0 and W % 2 == 0
    required (framework canvases are multiples of 32).
    """
    b, h, w, cin = x.shape
    assert cin == 3 and h % TILE == 0 and w % 2 == 0, (h, w, cin)
    c = w11.shape[-1]
    dt = x.dtype

    # Pre-pad (SAME halos become static slices) and flatten W*3 into lanes.
    xpad = jnp.pad(x, ((0, 0), (2, 2), (2, 2), (0, 0)))
    xpad = xpad.reshape(b, h + 4, (w + 4) * 3)
    w11r = w11.reshape(27, c).astype(dt)       # (dy, dx, cin)-major
    w12r = w12.reshape(9, c, c).astype(dt)
    b11r = b11.reshape(1, c).astype(jnp.float32)
    b12r = b12.reshape(1, c).astype(jnp.float32)

    grid = (b, h // TILE)
    out = pl.pallas_call(
        partial(_kernel, w, c),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, h + 4, (w + 4) * 3),
                         lambda bi, i: (bi, 0, 0),
                         memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, TILE // 2, w // 2, c),
                               lambda bi, i: (bi, i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, h // 2, w // 2, c), dt),
        scratch_shapes=[
            pltpu.VMEM((TILE + 4, (w + 4) * 3), dt),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(xpad, w11r, b11r, w12r, b12r)
    return out
