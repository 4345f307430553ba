"""Int8 3x3-conv strip kernel: read the input ONCE, all else in VMEM.

Why (round-3 measurement, DESIGN.md): the XLA dx-pack GEMM formulation of
the int8 conv (ops/conv_int8.py) reaches ~206 T/s on the MXU at conv4
shapes — but materializes the packed activations in HBM and reads them
three times, which LOSES to XLA's fused bf16 conv at the large-spatial/
small-C layers (conv2/conv3): full-trunk int8 measured 1.75x SLOWER than
bf16. The conv itself was never the problem; the data movement was. This
kernel removes it:

  grid step (b, strip i):
    DMA rows [i*T, i*T + T + 2) of the pre-padded int8 input into VMEM
    for (dy, dx) in 3x3:
        a = roll(strip[dy:dy+T], -dx, axis=W)[:, :W]   # in-VMEM shift
        acc += a.reshape(T*W, C) @ w[dy*3+dx]          # int8 MXU, K=C
    epilogue in VMEM: y = relu(acc * (s_x * s_w) + bias); requantize
    write the [T, W, Co] output strip (int8, or `out_dtype` for the last)

HBM traffic per layer: read x once + write y once (1 byte/el each) — the
speed-of-light for this op. Mosaic constraints respected (learned on the
conv1 kernel, DESIGN.md finding 12): the HBM ref is whole-array with the
batch/strip index applied inside the kernel's DMA; dx shifts use
``pltpu.roll`` on the sublane axis instead of unaligned slices; all
reshapes only collapse leading dims.

Reference equivalent: the Caffe VGG-16 conv layers (SURVEY.md §2.1; mount
empty — no file:line exists). The reference has no quantized path.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(s_x, s_out, t_rows, w_out, out_dtype,
            w_ref, sw_ref, b_ref, x_hbm, out_ref, xs, sem):
    b = pl.program_id(0)
    i = pl.program_id(1)
    c = x_hbm.shape[-1]
    co = w_ref.shape[-1]

    cp = pltpu.make_async_copy(
        x_hbm.at[b, pl.ds(i * t_rows, t_rows + 2)], xs, sem)
    cp.start()
    cp.wait()

    acc = jnp.zeros((t_rows * w_out, co), jnp.int32)
    for dy in range(3):
        for dx in range(3):
            # Unaligned static sublane slice of the VMEM strip. (The first
            # attempt used pltpu.roll, but Mosaic's rotate only handles
            # 32-bit data, and bitcast packs along the 2nd-minor dim so it
            # cannot regroup channels — learned on hardware.)
            a = xs[dy : dy + t_rows, dx : dx + w_out, :]
            a = a.reshape(t_rows * w_out, c)
            acc = acc + jax.lax.dot_general(
                a, w_ref[dy * 3 + dx],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )

    y = acc.astype(jnp.float32) * (s_x * sw_ref[0]) + b_ref[0]
    y = jnp.maximum(y, 0.0)
    if s_out is None:
        out = y.astype(out_dtype)
    else:
        out = jnp.clip(jnp.round(y * (1.0 / s_out)), -127.0, 127.0
                       ).astype(jnp.int8)
    out_ref[0] = out.reshape(t_rows, w_out, co)


def _auto_t_rows(h: int, w: int) -> int:
    """Strip height from the round-3 hardware sweep: T=8 or 16 only —
    larger strips measured 2-3x SLOWER (VMEM pressure kills the automatic
    cross-step overlap), and wide layers prefer 8-16 regardless of the
    naive M=T*W reasoning. Best-by-shape: W>=300 -> 16, W in [150,300) ->
    mixed (8 and 16 within noise; use 16 for C<=128 inputs' larger M),
    W<150 -> 8."""
    return 16 if w >= 150 else 8


def conv3x3_int8_pallas(x_i8, s_x, w_q9, s_w, bias, s_out=None,
                        out_dtype=jnp.bfloat16, t_rows: int | None = None,
                        interpret: bool = False):
    """3x3/SAME conv + ReLU on int8 activations (strip kernel).

    x_i8: [B, H, W, C] int8, activation scale ``s_x`` (python float).
    w_q9: [9, C, Co] int8, taps in (dy*3 + dx) order; s_w [Co] f32.
    Returns int8 [B, H, W, Co] when ``s_out`` is given, else ``out_dtype``.
    vmap-safe: a custom_vmap rule folds mapped batch axes into the
    kernel's own batch grid (the default pallas batching rule would
    block the ANY-space input, which the TPU lowering rejects).
    """
    if t_rows is None:
        t_rows = _auto_t_rows(x_i8.shape[1], x_i8.shape[2])

    @jax.custom_batching.custom_vmap
    def conv(x, w9, sw, b_):
        return _conv_impl(x, float(s_x), w9, sw, b_,
                          None if s_out is None else float(s_out),
                          out_dtype, t_rows, interpret)

    @conv.def_vmap
    def _vmap_rule(axis_size, in_batched, x, w9, sw, b_):
        if any(in_batched[1:]):
            raise NotImplementedError("batched int8 conv weights")
        if not in_batched[0]:
            return conv(x, w9, sw, b_), False
        vb, bb, h, w, c = x.shape
        out = conv(x.reshape(vb * bb, h, w, c), w9, sw, b_)
        return out.reshape((vb, bb) + out.shape[1:]), True

    return conv(x_i8, w_q9, s_w, bias)


def _conv_impl(x_i8, s_x, w_q9, s_w, bias, s_out, out_dtype, t_rows,
               interpret):
    b, h, w, c = x_i8.shape
    co = w_q9.shape[-1]
    hp = -(-h // t_rows) * t_rows
    # Pre-pad once in XLA (cheap int8 pass): +1 halo each side in H/W,
    # H rounded so every strip is full, and the padded width rounded to a
    # multiple of 8 — DMA slice shapes must be sublane-aligned (Mosaic:
    # "Slice shape along dimension 2 must be aligned to tiling (8)").
    wp2 = -(-(w + 2) // 8) * 8
    # DMA lane dim must be 128-aligned: pad C up (only conv2_1's C=64 input
    # in the VGG trunk; zero channels contribute nothing to the dots).
    cp = -(-c // 128) * 128
    xp = jnp.pad(x_i8, ((0, 0), (1, 1 + (hp - h)), (1, wp2 - w - 1),
                        (0, cp - c)))
    if cp != c:
        w_q9 = jnp.pad(w_q9, ((0, 0), (0, cp - c), (0, 0)))
        c = cp
    n_strips = hp // t_rows

    out = pl.pallas_call(
        partial(_kernel, s_x, s_out, t_rows, w, out_dtype),
        grid=(b, n_strips),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # w_q9 whole
            pl.BlockSpec(memory_space=pltpu.VMEM),  # s_w (1, Co)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # bias (1, Co)
            pl.BlockSpec(memory_space=pltpu.ANY),   # x: whole, DMA'd
        ],
        out_specs=pl.BlockSpec((1, t_rows, w, co), lambda bb, ii: (bb, ii, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (b, hp, w, co), jnp.int8 if s_out is not None else out_dtype),
        scratch_shapes=[
            pltpu.VMEM((t_rows + 2, wp2, c), jnp.int8),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(w_q9, s_w.reshape(1, -1).astype(jnp.float32),
      jnp.asarray(bias, jnp.float32).reshape(1, -1), xp)
    return out[:, :h]


def pack_weights_9(w):
    """f32 [3, 3, C, Co] -> (int8 [9, C, Co] (dy*3+dx), scales [Co])."""
    s = jnp.maximum(jnp.max(jnp.abs(w), axis=(0, 1, 2)) / 127.0, 1e-12)
    q = jnp.clip(jnp.round(w / s), -127, 127).astype(jnp.int8)
    kh, kw, c, co = w.shape
    return q.reshape(kh * kw, c, co), s
