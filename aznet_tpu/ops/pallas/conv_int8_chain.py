"""Int8 conv CHAIN kernel: zero XLA glue between trunk layers.

Why (round-3 measurement, DESIGN.md finding 15b): the per-layer strip
kernel (conv_int8_kernel.py) beats XLA bf16 convs at every K >= 128, but
the END-TO-END hybrid trunk handed the win back — each layer paid three
extra XLA passes over its activations:

  1. ``jnp.pad`` of the input (+1 halo, W rounded to 8): read + write
     the whole tensor before the kernel can see it;
  2. ``out[:, :h]`` slice-off of the strip-rounded rows: another full
     read + write (XLA cannot fuse across the Pallas custom call);
  3. the 2x2 max-pools between blocks: one more read + write.

This kernel removes all three by changing the CONTRACT: activations flow
between chain layers in a fixed "haloed" layout that every kernel both
consumes and produces, and the pool runs inside the epilogue:

  haloed layout [B, HP, WP, C] int8:
    data rows 0..h-1 (rows h..HP-1 are zero), data cols 1..w
    (col 0 zero = left halo, cols w+1..WP-1 zero = right halo),
    WP = round-up(w + 2, 8)  (DMA slice shapes need 8-aligned sublanes),
    C multiple of 128        (128-aligned lanes; VGG chain C in {128,256,512}).

  grid step (b, strip i):
    DMA rows [i*T - 1, i*T + T + 1) into VMEM — the top/bottom halo rows
    come from the neighbouring strips' data; the first/last strips memset
    the missing halo row instead (static-shape copies under pl.when).
    nine shifted dots (int8 MXU, K = C), int32 accumulate
    epilogue: relu(acc * s_x * s_w + bias); mask rows >= h to zero;
    optional fused 2x2 max-pool; requantize; write the strip in the
    haloed layout of the NEXT layer (or compact ``out_dtype`` for the
    chain's last layer).

Monotonicity makes the fused pool exact: requant = clip(round(y / s)) is
non-decreasing, so max-pool-then-requant == requant-then-max-pool — the
chain is bit-identical to the per-layer kernel + XLA int8 pool it
replaces (asserted in tests/test_pallas.py).

HBM traffic per layer: read x once + write y once, int8 — nothing else.

Reference equivalent: the Caffe VGG-16 conv+pool stack (SURVEY.md §2.1
"AZ network definitions"; mount empty — no file:line exists). The
reference has no quantized path; this is TPU-new.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round8(n: int) -> int:
    return -(-n // 8) * 8


def halo_layout(x_i8: jnp.ndarray) -> jnp.ndarray:
    """[B, H, W, C] int8 -> haloed [B, H, WP, C] (chain entry; one XLA
    pad — the only glue pass the whole chain pays)."""
    w = x_i8.shape[2]
    wp = _round8(w + 2)
    return jnp.pad(x_i8, ((0, 0), (0, 0), (1, wp - w - 1), (0, 0)))


def _halo_dma(x_hbm, xs, sem, b, strip, t, n_strips, start, slot=None):
    """Issue (or wait for) the halo-row DMA of ``strip`` into scratch.

    Strip i needs input rows [i*t - 1, i*t + t + 1); the top row of strip
    0 and rows beyond the producer's allocation (HP) are zero by the
    layout contract, so they are memset instead of read (memsets run at
    issue time only). All copy shapes are static; pl.when selects the
    branch at runtime. ``slot=None`` = single-buffer scratch; otherwise
    the 2-slot double-buffer layout.
    """
    hp_in = x_hbm.shape[1]
    wp_in = x_hbm.shape[2]
    c = x_hbm.shape[3]

    def copy(src_row, dst_row, rows):
        dst = (xs.at[pl.ds(dst_row, rows)] if slot is None
               else xs.at[slot, pl.ds(dst_row, rows)])
        cp = pltpu.make_async_copy(
            x_hbm.at[b, pl.ds(src_row, rows)], dst, sem)
        (cp.start if start else cp.wait)()

    def memset(r):
        if start:
            zero = jnp.zeros((1, wp_in, c), jnp.int8)
            if slot is None:
                xs[r : r + 1] = zero
            else:
                xs[slot, r : r + 1] = zero

    if n_strips == 1:
        cnt = min(hp_in, t + 1)
        memset(0)
        copy(0, 1, cnt)
        for r in range(1 + cnt, t + 2):
            memset(r)
        return
    cnt_last = min(t + 2, hp_in - ((n_strips - 1) * t - 1))

    @pl.when(strip == 0)
    def _first():
        memset(0)
        copy(0, 1, t + 1)

    if n_strips > 2:
        @pl.when(jnp.logical_and(strip > 0, strip < n_strips - 1))
        def _interior():
            copy(strip * t - 1, 0, t + 2)

    @pl.when(strip == n_strips - 1)
    def _last():
        copy(strip * t - 1, 0, cnt_last)
        for r in range(cnt_last, t + 2):
            memset(r)


def _kernel(s_x, s_out, t, h, w, pool, out_dtype, n_strips,
            w_ref, sw_ref, b_ref, x_hbm, out_ref, xs, sem):
    b = pl.program_id(0)
    i = pl.program_id(1)
    c = x_hbm.shape[3]
    co = w_ref.shape[-1]

    _halo_dma(x_hbm, xs, sem, b, i, t, n_strips, start=True)
    _halo_dma(x_hbm, xs, sem, b, i, t, n_strips, start=False)

    _dots_epilogue(s_x, s_out, t, h, w, pool, out_dtype, n_strips, i,
                   lambda dy, dx: xs[dy : dy + t, dx : dx + w, :],
                   w_ref, sw_ref, b_ref, out_ref, c, co)


def _dots_epilogue(s_x, s_out, t, h, w, pool, out_dtype, n_strips, i,
                   read, w_ref, sw_ref, b_ref, out_ref, c, co):
    acc = jnp.zeros((t * w, co), jnp.int32)
    for dy in range(3):
        for dx in range(3):
            a = read(dy, dx).reshape(t * w, c)
            acc = acc + jax.lax.dot_general(
                a, w_ref[dy * 3 + dx],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )

    y = acc.astype(jnp.float32) * (s_x * sw_ref[0]) + b_ref[0]
    y = jnp.maximum(y, 0.0).reshape(t, w, co)
    # Rows past the data (strip rounding) would be relu(bias), not zero —
    # mask them so they are a valid zero halo for the next layer.
    if n_strips * t != h:
        row = i * t + jax.lax.broadcasted_iota(jnp.int32, (t, 1, 1), 0)
        y = jnp.where(row < h, y, 0.0)
    if pool:
        y = y.reshape(t // 2, 2, w // 2, 2, co).max(axis=(1, 3))
    if s_out is None:
        out_ref[0] = y.astype(out_dtype)
    else:
        q = jnp.clip(jnp.round(y * (1.0 / s_out)), -127.0, 127.0
                     ).astype(jnp.int8)
        # Write the strip in the next layer's haloed layout: data at cols
        # [1, 1 + w_out), zero halo columns around it (unaligned static
        # slice stores inside VMEM are fine on Mosaic).
        w_out = w // 2 if pool else w
        t_o, wp_out = out_ref.shape[1], out_ref.shape[2]
        out_ref[0, :, 1 : 1 + w_out, :] = q
        out_ref[0, :, 0:1, :] = jnp.zeros((t_o, 1, co), jnp.int8)
        if wp_out > w_out + 1:
            out_ref[0, :, 1 + w_out :, :] = jnp.zeros(
                (t_o, wp_out - w_out - 1, co), jnp.int8)


def _kernel_db(s_x, s_out, t, h, w, pool, out_dtype, n_strips,
               w_ref, sw_ref, b_ref, x_hbm, out_ref, xs, sems):
    """Double-buffered variant: strip i+1's halo DMA (and, in the
    prologue, strip 1's) is issued into the other scratch slot before —
    and strip i+2's after — computing strip i, so the DMA rides under
    the MXU work. Memsets of missing halo rows happen at issue time (the
    target slot was last read two grid steps ago). The VLIW core
    executes loads synchronously, so re-issuing into the just-read slot
    after the dots is safe."""
    b = pl.program_id(0)
    i = pl.program_id(1)
    c = x_hbm.shape[3]
    co = w_ref.shape[-1]

    def halo_dma(strip, slot, start):
        _halo_dma(x_hbm, xs, sems.at[slot], b, strip, t, n_strips,
                  start=start, slot=slot)

    slot = jax.lax.rem(i, 2)

    @pl.when(i == 0)
    def _prologue():
        halo_dma(jnp.int32(0), jnp.int32(0), start=True)

    if n_strips > 1:
        @pl.when(i == 0)
        def _prologue2():
            halo_dma(jnp.int32(1), jnp.int32(1), start=True)

    halo_dma(i, slot, start=False)  # wait for strip i

    _dots_epilogue(s_x, s_out, t, h, w, pool, out_dtype, n_strips, i,
                   lambda dy, dx: xs[slot, dy : dy + t, dx : dx + w, :],
                   w_ref, sw_ref, b_ref, out_ref, c, co)

    if n_strips > 2:
        @pl.when(i + 2 < n_strips)
        def _issue_next():
            halo_dma(i + 2, slot, start=True)


def conv3x3_int8_chain(x_hal, s_x, w_q9, s_w, bias, h: int, w: int,
                       s_out=None, pool: bool = False,
                       out_dtype=jnp.bfloat16, t_rows: int | None = None,
                       interpret: bool = False,
                       double_buffer: bool | None = None):
    """3x3/SAME conv + ReLU (+ optional fused 2x2/2 max-pool) on haloed
    int8 activations.

    x_hal: [B, HP, WP, C] int8 in the haloed layout (see module doc);
    ``h``/``w`` are the true data dims. w_q9 [9, C, Co] int8 in
    (dy*3 + dx) order with per-channel scales s_w [Co] (see
    conv_int8_kernel.pack_weights_9); s_x / s_out python-float activation
    scales. Returns the next layer's haloed int8 input, or — when
    ``s_out`` is None (chain exit) — compact ``out_dtype``
    [B, ceil(h/T)*T, w, Co] to be sliced ``[:, :h]`` by the caller.
    vmap folds mapped axes into the batch grid (custom_vmap, as the strip
    kernel does).
    """
    if t_rows is None:
        import os

        from aznet_tpu.ops.pallas.conv_int8_kernel import _auto_t_rows

        # AZNET_INT8_TROWS: hardware-sweep override of the strip height.
        t_rows = (int(os.environ["AZNET_INT8_TROWS"])
                  if os.environ.get("AZNET_INT8_TROWS")
                  else _auto_t_rows(h, w))
    if double_buffer is None:
        import os

        # AZNET_INT8_DB=0 disables the double-buffered halo DMA (A/B).
        double_buffer = os.environ.get("AZNET_INT8_DB", "1") != "0"
    # VMEM budget clamp: the epilogue's int32 acc + f32 y cost t*w*co*8
    # bytes on the scoped stack, plus the input scratch (x2 when double-
    # buffered); conv1_2-sized strips (w=800, t=16, co=128 -> 13 MB) blow
    # the 16 MB limit.
    co_ = w_q9.shape[-1]
    wp_ = x_hal.shape[-2]
    c_ = x_hal.shape[-1]
    n_slots = 2 if double_buffer else 1
    while (t_rows > 8 and t_rows * w * co_ * 8
           + n_slots * (t_rows + 2) * wp_ * c_ > 11 * 2 ** 20):
        t_rows //= 2
    if pool:
        if s_out is None:
            raise ValueError("fused pool is only for chain-interior layers")
        if h % 2 or w % 2 or t_rows % 2:
            raise ValueError(f"fused 2x2 pool needs even h/w/t ({h},{w},{t_rows})")

    @jax.custom_batching.custom_vmap
    def conv(x, w9, sw, b_):
        return _chain_impl(x, float(s_x), w9, sw, b_, h, w,
                           None if s_out is None else float(s_out),
                           pool, out_dtype, t_rows, interpret,
                           double_buffer)

    @conv.def_vmap
    def _vmap_rule(axis_size, in_batched, x, w9, sw, b_):
        if any(in_batched[1:]):
            raise NotImplementedError("batched int8 conv weights")
        if not in_batched[0]:
            return conv(x, w9, sw, b_), False
        vb, bb = x.shape[:2]
        out = conv(x.reshape((vb * bb,) + x.shape[2:]), w9, sw, b_)
        return out.reshape((vb, bb) + out.shape[1:]), True

    return conv(x_hal, w_q9, s_w, bias)


def _chain_impl(x_hal, s_x, w_q9, s_w, bias, h, w, s_out, pool, out_dtype,
                t_rows, interpret, double_buffer=False):
    b, hp_in, wp_in, c = x_hal.shape
    co = w_q9.shape[-1]
    if c % 128 or wp_in % 8:
        raise ValueError(f"haloed layout violated: C={c}, WP={wp_in}")
    if wp_in < w + 2 or hp_in < h:
        raise ValueError(f"haloed input too small for data {h}x{w}: "
                         f"{hp_in}x{wp_in}")
    n_strips = -(-h // t_rows)
    t_out = t_rows // 2 if pool else t_rows
    if s_out is not None:
        w_out = w // 2 if pool else w
        wp_out = _round8(w_out + 2)
        out_shape = jax.ShapeDtypeStruct(
            (b, n_strips * t_out, wp_out, co), jnp.int8)
        out_block = (1, t_out, wp_out, co)
    else:
        out_shape = jax.ShapeDtypeStruct(
            (b, n_strips * t_rows, w, co), out_dtype)
        out_block = (1, t_rows, w, co)

    kern = _kernel_db if double_buffer else _kernel
    return pl.pallas_call(
        partial(kern, s_x, s_out, t_rows, h, w, pool, out_dtype,
                n_strips),
        grid=(b, n_strips),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # w_q9 whole
            pl.BlockSpec(memory_space=pltpu.VMEM),  # s_w (1, Co)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # bias (1, Co)
            pl.BlockSpec(memory_space=pltpu.ANY),   # x: whole, DMA'd
        ],
        out_specs=pl.BlockSpec(out_block, lambda bb, ii: (bb, ii, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM(((2,) if double_buffer else ())
                       + (t_rows + 2, wp_in, c), jnp.int8),
            pltpu.SemaphoreType.DMA((2,)) if double_buffer
            else pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(w_q9, s_w.reshape(1, -1).astype(jnp.float32),
      jnp.asarray(bias, jnp.float32).reshape(1, -1), x_hal)
