"""Tiled greedy NMS as a single Pallas kernel (natively batched).

Reference equivalent: ``lib/utils/nms.pyx`` (SURVEY.md §2.3) — the host
Cython greedy loop; the BASELINE "NMS Mboxes/sec" metric targets exactly
this op. The pure-JAX ``nms_mask`` (ops/nms.py) is exact but fixpoint-
iterative: it materializes the (N, N) IoU matrix in HBM and re-reduces it
every iteration. This kernel computes greedy NMS in ONE pass by exploiting
the TPU's sequential grid:

  grid step (b, i) (stream b, TILE-box tile i, score-descending order):
    1. cross-tile suppression: IoU(tile_i, tile_j) against every EARLIER
       tile j, masked by tile_j's already-final keep row (read back from the
       output ref — TPU grids execute in row-major order, so the per-stream
       keep block doubles as carry state across i).
    2. within-tile resolution via the antitone fixpoint on the tile's own
       (TILE, TILE) suppression matrix — exact greedy (triangular S
       stabilizes element-by-element, so it terminates in chain-depth
       iterations; a TILE-step sequential loop would be exact too, but
       Mosaic unrolls fori loops and the compile exploded).
    3. write keep row i.

Coordinates are passed in BOTH (4, N) lane-major and (N, 4) sublane-major
layouts so the in-kernel row/column broadcasts need no relayout. The
sublane copy is BLOCKED per tile ((TILE, 4) per grid step) — keeping the
whole (N, 4) array resident cost 32x lane padding (the round-2 bench's
16x4096 regime lost >2x to it); the per-tile block is a 4 KB DMA. Batched
streams map to the leading grid dimension, so one kernel launch handles
the serving shape ``[B, N]`` with every stream's state in VMEM.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 256  # default; nms_pallas_batched(tile=...) overrides for tuning


def _nms_kernel(offset, TILE, thresh_ref, lane_ref, sub_ref, valid_ref, keep_ref):
    """Blocks per (b, i) step: lane (1,4,N), sub (1,TILE,4) [tile i],
    valid (1,1,N), keep (1,tiles,TILE) [stream-resident carry]."""
    i = pl.program_id(1)
    # Row-layout (TILE, 1) coords of tile i from its (TILE, 4) block.
    rx1 = sub_ref[0, :, pl.ds(0, 1)]
    ry1 = sub_ref[0, :, pl.ds(1, 1)]
    rx2 = sub_ref[0, :, pl.ds(2, 1)]
    ry2 = sub_ref[0, :, pl.ds(3, 1)]
    _nms_body(offset, TILE, i, rx1, ry1, rx2, ry2, thresh_ref, lane_ref,
              valid_ref, keep_ref)


def _nms_kernel_nosub(offset, TILE, thresh_ref, lane_ref, valid_ref,
                      keep_ref):
    """`derive_sub` variant: tile i's row-layout coords come from an
    in-kernel (4, TILE) -> (TILE, 4) transpose of the lane block instead
    of a second XLA-side gather of the sorted (N, 4) array (that gather's
    4-lane rows pad 32x — it measured as a large share of the wrapper
    cost in the 16x4096 serving regime)."""
    i = pl.program_id(1)
    sub = jnp.swapaxes(lane_ref[0, :, pl.ds(i * TILE, TILE)], 0, 1)
    rx1 = sub[:, 0:1]
    ry1 = sub[:, 1:2]
    rx2 = sub[:, 2:3]
    ry2 = sub[:, 3:4]
    _nms_body(offset, TILE, i, rx1, ry1, rx2, ry2, thresh_ref, lane_ref,
              valid_ref, keep_ref)


def _nms_body(offset, TILE, i, rx1, ry1, rx2, ry2, thresh_ref, lane_ref,
              valid_ref, keep_ref):
    t = thresh_ref[0, 0]
    area_r = (rx2 - rx1 + offset) * (ry2 - ry1 + offset)  # (T, 1)
    valid_i = valid_ref[0, :, pl.ds(i * TILE, TILE)]  # (1, T)

    def iou_cols(j):
        """IoU of tile i rows vs tile j columns -> (T, T)."""
        cx1 = lane_ref[0, pl.ds(0, 1), pl.ds(j * TILE, TILE)]
        cy1 = lane_ref[0, pl.ds(1, 1), pl.ds(j * TILE, TILE)]
        cx2 = lane_ref[0, pl.ds(2, 1), pl.ds(j * TILE, TILE)]
        cy2 = lane_ref[0, pl.ds(3, 1), pl.ds(j * TILE, TILE)]
        iw = jnp.minimum(rx2, cx2) - jnp.maximum(rx1, cx1) + offset
        ih = jnp.minimum(ry2, cy2) - jnp.maximum(ry1, cy1) + offset
        inter = jnp.maximum(iw, 0.0) * jnp.maximum(ih, 0.0)
        area_c = (cx2 - cx1 + offset) * (cy2 - cy1 + offset)  # (1, T)
        union = area_r + area_c - inter
        return jnp.where(union > 0, inter / union, 0.0)

    # 1) cross-tile suppression from all earlier (finalized) tiles.
    def prev_body(j, supp):
        iou = iou_cols(j)
        keep_j = keep_ref[0, pl.ds(j, 1), :]  # (1, T)
        hit = jnp.max(jnp.where((iou > t) & (keep_j > 0.0), 1.0, 0.0),
                      axis=1, keepdims=True)  # (T, 1)
        return jnp.maximum(supp, hit)

    supp = jax.lax.fori_loop(0, i, prev_body, jnp.zeros((TILE, 1), jnp.float32))

    # 2) within-tile antitone fixpoint (exact greedy, terminates <= TILE).
    iou_ii = iou_cols(i)
    row_id = jax.lax.broadcasted_iota(jnp.int32, (TILE, TILE), 0)
    col_id = jax.lax.broadcasted_iota(jnp.int32, (TILE, TILE), 1)
    s_mat = jnp.where((iou_ii > t) & (col_id < row_id), 1.0, 0.0)  # j supp i
    init = valid_i * (1.0 - supp.reshape(1, TILE))  # (1, T)

    def fix_cond(carry):
        _, changed = carry
        return changed > 0

    def fix_body(carry):
        keep, _ = carry
        hit = jnp.max(s_mat * keep, axis=1, keepdims=True)  # (T, 1)
        new_keep = init * (1.0 - hit.reshape(1, TILE))
        changed = jnp.sum(jnp.abs(new_keep - keep))
        return new_keep, changed

    keep_i, _ = jax.lax.while_loop(fix_cond, fix_body, (init, jnp.float32(1.0)))

    # 3) finalize this tile's keep row.
    keep_ref[0, pl.ds(i, 1), :] = keep_i


def _descending_order(s, mode: str):
    """Score-descending permutation with ascending-index tie-break.

    ``mode='argsort'``: ``jnp.argsort(-s, stable=True)`` — XLA's stable
    float comparator. ``mode='intkey'``: the same EXACT order via one
    unstable two-key integer sort: scores are bit-mapped to a uint32 key
    whose unsigned order equals float order (IEEE sign-fold), complemented
    for descending, with the index iota as the secondary key — (key, idx)
    pairs are unique, so the unstable bitonic sort is deterministic and
    equals the stable argsort while comparing plain integers instead of
    running the stable-float comparator. Requires NaN-free scores (the
    wrapper only ever feeds finite scores or the -inf invalid mask).

    intkey keys at float32 width, so float64 inputs (x64 mode) whose
    near-equal scores differ only below f32 precision would reorder
    relative to a float64 stable argsort; that dtype falls back to the
    argsort path to keep the exact-order contract unconditional.
    """
    if mode == "argsort" or s.dtype == jnp.float64:
        return jnp.argsort(-s, axis=1, stable=True)
    assert mode == "intkey", mode
    key = _intkey_u32(s)
    iota = jnp.broadcast_to(jnp.arange(s.shape[1], dtype=jnp.int32),
                            s.shape)
    _, order = jax.lax.sort((key, iota), dimension=1, num_keys=2,
                            is_stable=False)
    return order


def _intkey_u32(s):
    """uint32 keys whose ASCENDING unsigned order == score-descending.

    Flush every exponent-zero value (+-0.0 AND subnormals) to the +0.0
    key so float-compare-equal scores get ONE key and the index
    tie-break decides, matching the stable argsort under XLA's
    flush-to-zero comparator (TPU has no subnormals; CPU XLA sorts with
    FTZ). Must happen on the integer side: a float-side `s + 0.0` fold
    is elided by XLA under jit (round-3 advisor finding)."""
    u = jax.lax.bitcast_convert_type(s.astype(jnp.float32), jnp.uint32)
    u = jnp.where((u & jnp.uint32(0x7F800000)) == 0, jnp.uint32(0), u)
    sign = (u >> 31).astype(jnp.uint32)
    key = u ^ (sign * jnp.uint32(0x7FFFFFFF) + jnp.uint32(0x80000000))
    return ~key  # descending score == ascending complemented key


# int32 image of the -inf score's key under _intkey_i32 (the invalid-row
# sentinel: the wrapper maps masked rows to score -inf, which must sort
# LAST in descending-score order => LARGEST int32 key).
IKEY_NEG_INF = 0x7F800000


def _intkey_i32(s):
    """Signed-int32 keys, same order as :func:`_intkey_u32` (the uint32
    key xor 0x80000000 maps unsigned order onto signed order) — the
    in-kernel bitonic network compares plain int32."""
    return jax.lax.bitcast_convert_type(
        _intkey_u32(s) ^ jnp.uint32(0x80000000), jnp.int32)


def _bitonic6_kernel(rows, key_ref, idx_ref, c0_ref, c1_ref, c2_ref, c3_ref,
                     key_o, idx_o, c0_o, c1_o, c2_o, c3_o):
    """Per-stream bitonic sort, ASCENDING by (key, idx) — keys are the
    complemented intkeys, so ascending == score-descending with the
    ascending-index tie-break of the stable argsort — carrying the four
    coordinate planes through the same exchanges.

    Layout: flat element i = row * 128 + lane of a (rows, 128) block.
    Compare-exchange partner i ^ j is materialized with two rotates
    (lane rotates for j < 128, sublane rotates above) selected by bit j
    of i — TPU rotate is 32-bit-wide, which every operand here is.
    (key, idx) pairs are unique, so the network is deterministic and its
    result equals the stable sort."""
    key = key_ref[0]
    idx = idx_ref[0]
    cs = [c0_ref[0], c1_ref[0], c2_ref[0], c3_ref[0]]
    lanes = key.shape[1]
    lane = jax.lax.broadcasted_iota(jnp.int32, key.shape, 1)
    row = jax.lax.broadcasted_iota(jnp.int32, key.shape, 0)
    flat = row * lanes + lane
    n = rows * lanes
    k = 2
    while k <= n:
        j = k // 2
        while j >= 1:
            if j < lanes:
                lo_bit = (lane & j) == 0
                ax, sh = 1, j
            else:
                sh = j // lanes
                lo_bit = (row & sh) == 0
                ax = 0

            def partner(x, lo_bit=lo_bit, ax=ax, sh=sh):
                return jnp.where(lo_bit, jnp.roll(x, -sh, axis=ax),
                                 jnp.roll(x, sh, axis=ax))

            pk = partner(key)
            pidx = partner(idx)
            pcs = [partner(c) for c in cs]
            # Standard network: within a 2k block, ascending iff bit k of
            # i is clear; the LOWER pair index takes the smaller element
            # in ascending blocks. Computed symmetrically on both sides.
            asc = (flat & k) == 0
            own_first = (key < pk) | ((key == pk) & (idx < pidx))
            # take_own = own_first iff asc == lo_bit, else its negation:
            # pure i1 XOR chain. (A bool-valued jnp.where here lowered to
            # an i8->i1 arith.trunci that Mosaic rejects on hardware —
            # caught by tpu_checks nms_bitonic_vs_argsort_order, r5.)
            take_own = own_first ^ asc ^ lo_bit
            key = jnp.where(take_own, key, pk)
            idx = jnp.where(take_own, idx, pidx)
            cs = [jnp.where(take_own, c, pc) for c, pc in zip(cs, pcs)]
            j //= 2
        k *= 2
    key_o[0] = key
    idx_o[0] = idx
    for ref, c in zip((c0_o, c1_o, c2_o, c3_o), cs):
        ref[0] = c


def _bitonic_sort6(key, idx, coords, interpret: bool = False):
    """Sort ``key/idx [B, n] int32`` ascending per stream, permuting the
    four ``coords [B, n, 4]`` planes along. n must be a power of two and a
    multiple of 128. Returns (skey, sidx, sx1, sy1, sx2, sy2)."""
    bsz, n = key.shape
    assert n % 128 == 0 and (n & (n - 1)) == 0, n
    rows = n // 128

    def resh(a):
        return a.reshape(bsz, rows, 128)

    args = [resh(key), resh(idx)] + [resh(coords[..., i]) for i in range(4)]
    spec = pl.BlockSpec((1, rows, 128), lambda b: (b, 0, 0),
                        memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        partial(_bitonic6_kernel, rows),
        grid=(bsz,),
        in_specs=[spec] * 6,
        out_specs=[spec] * 6,
        out_shape=[jax.ShapeDtypeStruct((bsz, rows, 128), a.dtype)
                   for a in args],
        interpret=interpret,
    )(*args)
    return [o.reshape(bsz, n) for o in outs]


def _bitonic_unpermute_kernel(rows, idx_ref, keep_ref, keep_o):
    """Invert the sort permutation INSIDE Pallas: bitonic-sort (idx, keep)
    pairs ascending by ``idx``. ``idx`` is a unique permutation of
    0..n-1 (the forward network's carried index plane), so after this
    network the keep plane sits in original-slot order — replacing the
    XLA-side bool scatter, the last piece of the 16x4096 NMS program
    outside Pallas (DESIGN finding 28's ~0.4 ms residual). Same
    rotate-materialized compare-exchange as :func:`_bitonic6_kernel`,
    two planes instead of six and no tie-break (keys unique)."""
    idx = idx_ref[0]
    keep = keep_ref[0]
    lanes = idx.shape[1]
    lane = jax.lax.broadcasted_iota(jnp.int32, idx.shape, 1)
    row = jax.lax.broadcasted_iota(jnp.int32, idx.shape, 0)
    flat = row * lanes + lane
    n = rows * lanes
    k = 2
    while k <= n:
        j = k // 2
        while j >= 1:
            if j < lanes:
                lo_bit = (lane & j) == 0
                ax, sh = 1, j
            else:
                sh = j // lanes
                lo_bit = (row & sh) == 0
                ax = 0

            def partner(x, lo_bit=lo_bit, ax=ax, sh=sh):
                return jnp.where(lo_bit, jnp.roll(x, -sh, axis=ax),
                                 jnp.roll(x, sh, axis=ax))

            pidx = partner(idx)
            pkeep = partner(keep)
            asc = (flat & k) == 0
            own_first = idx < pidx
            take_own = own_first ^ asc ^ lo_bit  # i1 XOR chain (see above)
            idx = jnp.where(take_own, idx, pidx)
            keep = jnp.where(take_own, keep, pkeep)
            j //= 2
        k *= 2
    keep_o[0] = keep


def _bitonic_unpermute(order, keepf, interpret: bool = False):
    """Scatter ``keepf [B, n] f32`` back to original slots given the sort
    permutation ``order [B, n] int32`` (unique), entirely inside Pallas.
    n must be a power of two and a multiple of 128."""
    bsz, n = order.shape
    assert n % 128 == 0 and (n & (n - 1)) == 0, n
    rows = n // 128
    spec = pl.BlockSpec((1, rows, 128), lambda b: (b, 0, 0),
                        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        partial(_bitonic_unpermute_kernel, rows),
        grid=(bsz,),
        in_specs=[spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((bsz, rows, 128), keepf.dtype),
        interpret=interpret,
    )(order.reshape(bsz, rows, 128), keepf.reshape(bsz, rows, 128))
    return out.reshape(bsz, n)


def nms_pallas_batched(boxes, scores, thresh, valid=None, offset: float = 1.0,
                       interpret: bool = False, tile: int = TILE,
                       derive_sub: bool = True, lane_gather: bool = False,
                       unpermute: "str | None" = None,
                       order_mode: str = "argsort"):
    """Exact greedy-NMS keep masks for ``boxes [B, N, 4]``/``scores [B, N]``
    in ORIGINAL order — B independent streams in ONE kernel launch
    (grid = streams x tiles).

    Wrapper-layout knobs (identical keep sets, parameterized tests):
    ``derive_sub`` (default True, the idle-chip A/B winner at 16x4096 —
    tools/bench_nms_variants.py): skip passing the sorted (B, N, 4)
    array to the kernel; each tile's row-layout coords come from an
    in-kernel transpose of its lane block. ``lane_gather``: permute
    boxes in the (B, 4, N) lane layout instead of gather-then-transpose.
    ``unpermute='gather'``: argsort-based inverse permutation instead of
    the bool scatter. On an idle chip all variants land within ~6%
    (22.3-23.6 Mboxes/s vs a 46 Mboxes/s sorted-input kernel-only lower
    bound — the argsort dominates the wrapper); loaded-machine runs
    exaggerate the differences wildly (DESIGN.md finding 20).

    ``order_mode='bitonic'``: the round-5 path — ordering happens INSIDE
    a Pallas kernel (a bitonic network over (intkey, index) pairs that
    carries the coordinate planes through the same exchanges), so the
    XLA sort AND the sorted gathers disappear; only the unpermute stays
    outside — unless ``unpermute='bitonic'`` (round-5b, the default for
    this mode), which inverts the permutation with a second 2-plane
    network in VMEM so NO XLA-side permutation work remains (39.2 vs
    33.6 Mboxes/s end-to-end at 16x4096, finding 28). Same keep sets and
    order contract as 'intkey'/'argsort' (pinned by tests + tpu_checks);
    pads N to a power of two for the network (free at the 4096 serving
    shape). ``unpermute=None`` resolves to 'bitonic' under
    ``order_mode='bitonic'`` and 'scatter' otherwise (incl. the float64
    fallback, where no in-kernel permutation exists).
    """
    bsz, n = scores.shape
    if unpermute is None:
        unpermute = ("bitonic" if order_mode == "bitonic"
                     and scores.dtype != jnp.float64 else "scatter")
    if valid is None:
        valid = jnp.ones((bsz, n), bool)
    neg_inf = jnp.asarray(-jnp.inf, scores.dtype)
    s = jnp.where(valid, scores, neg_inf)

    if order_mode == "bitonic" and s.dtype != jnp.float64:
        # In-kernel ordering (DESIGN finding 23: the XLA-side sort +
        # gathers are ~half the 16x4096 NMS program; an in-VMEM ordering
        # is the only remaining lever toward the kernel-only bound). The
        # bitonic network sorts (intkey, index) pairs and carries the four
        # coordinate planes, so the sorted gathers disappear too; only the
        # final unpermute stays in XLA. float64 falls back below (keys are
        # f32-wide, same contract as 'intkey').
        n_pad = max(tile, 128, 1 << (n - 1).bit_length())
        assert n_pad % tile == 0, (n_pad, tile)  # tile must be a power of 2
        num_tiles = n_pad // tile
        pad = n_pad - n
        s_p = jnp.pad(s.astype(jnp.float32), ((0, 0), (0, pad)),
                      constant_values=-jnp.inf)
        boxes_p = jnp.pad(boxes.astype(jnp.float32),
                          ((0, 0), (0, pad), (0, 0)))
        iota = jnp.broadcast_to(jnp.arange(n_pad, dtype=jnp.int32),
                                (bsz, n_pad))
        skey, order, sx1, sy1, sx2, sy2 = _bitonic_sort6(
            _intkey_i32(s_p), iota, boxes_p, interpret=interpret)
        svalid_f = (skey != IKEY_NEG_INF).astype(jnp.float32)
        lane = jnp.stack([sx1, sy1, sx2, sy2], axis=1)  # (B, 4, n_pad)
        keep_rows = pl.pallas_call(
            partial(_nms_kernel_nosub, offset, tile),
            grid=(bsz, num_tiles),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 4, n_pad), lambda b, i: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, n_pad), lambda b, i: (b, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, num_tiles, tile),
                                   lambda b, i: (b, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((bsz, num_tiles, tile),
                                           jnp.float32),
            interpret=interpret,
        )(jnp.asarray(thresh, jnp.float32).reshape(1, 1), lane,
          svalid_f.reshape(bsz, 1, n_pad))
        if unpermute == "bitonic":
            # Inverse permutation in VMEM too: sort (order, keep) by order
            # with a second (2-plane) bitonic network — no XLA scatter or
            # rank-sort left anywhere in the NMS program.
            keepf = _bitonic_unpermute(order, keep_rows.reshape(bsz, n_pad),
                                       interpret=interpret)
            return (keepf > 0.0)[:, :n]
        keep_sorted = keep_rows.reshape(bsz, n_pad) > 0.0
        if unpermute == "gather":
            iota2 = jnp.broadcast_to(jnp.arange(n_pad, dtype=jnp.int32),
                                     order.shape)
            _, rank = jax.lax.sort((order, iota2), dimension=1, num_keys=1,
                                   is_stable=False)
            return jnp.take_along_axis(keep_sorted, rank, axis=1)[:, :n]
        out = jnp.zeros((bsz, n_pad), bool)
        return jax.vmap(lambda o, idx, k: o.at[idx].set(k))(
            out, order, keep_sorted)[:, :n]

    order = _descending_order(s, order_mode)
    svalid = jnp.take_along_axis(valid, order, axis=1)

    n_pad = int(-(-n // tile) * tile)
    num_tiles = n_pad // tile
    pad = n_pad - n
    svalid_f = jnp.pad(svalid.astype(jnp.float32), ((0, 0), (0, pad)))

    if lane_gather:
        lane = jnp.take_along_axis(
            jnp.swapaxes(boxes, 1, 2).astype(jnp.float32),
            order[:, None, :], axis=2)
        lane = jnp.pad(lane, ((0, 0), (0, 0), (0, pad)))
        sboxes = None if derive_sub else jnp.swapaxes(lane, 1, 2)
    else:
        sboxes = jnp.take_along_axis(boxes, order[..., None], axis=1)
        sboxes = jnp.pad(sboxes.astype(jnp.float32),
                         ((0, 0), (0, pad), (0, 0)))
        lane = jnp.swapaxes(sboxes, 1, 2)  # (B, 4, N): coords as lane rows
    thresh_arr = jnp.asarray(thresh, jnp.float32).reshape(1, 1)

    specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec((1, 4, n_pad), lambda b, i: (b, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tile, 4), lambda b, i: (b, i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, n_pad), lambda b, i: (b, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = (thresh_arr, lane, sboxes, svalid_f.reshape(bsz, 1, n_pad))
    kern = partial(_nms_kernel, offset, tile)
    if derive_sub:
        specs = specs[:2] + specs[3:]
        args = args[:2] + args[3:]
        kern = partial(_nms_kernel_nosub, offset, tile)

    keep_rows = pl.pallas_call(
        kern,
        grid=(bsz, num_tiles),
        in_specs=specs,
        out_specs=pl.BlockSpec((1, num_tiles, tile), lambda b, i: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, num_tiles, tile), jnp.float32),
        interpret=interpret,
    )(*args)

    keep_sorted = keep_rows.reshape(bsz, n_pad)[:, :n] > 0.0
    if unpermute == "gather":
        # rank[j] = position of box j in sorted order; one more argsort
        # but a lane-friendly gather instead of a bool scatter. ``order``
        # is a unique int permutation, so the unstable int sort is exact.
        iota = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32), order.shape)
        _, rank = jax.lax.sort((order.astype(jnp.int32), iota),
                               dimension=1, num_keys=1, is_stable=False)
        return jnp.take_along_axis(keep_sorted, rank, axis=1)
    out = jnp.zeros((bsz, n), bool)
    return jax.vmap(lambda o, idx, k: o.at[idx].set(k))(out, order, keep_sorted)


def nms_pallas(boxes, scores, thresh, valid=None, offset: float = 1.0,
               interpret: bool = False, order_mode: str = "argsort"):
    """Exact greedy-NMS keep mask in ORIGINAL order (Pallas TPU kernel).

    Same semantics as :func:`aznet_tpu.ops.nms.nms_mask`. ``interpret=True``
    runs the kernel in the Pallas interpreter (CPU tests).
    """
    return nms_pallas_batched(
        boxes[None], scores[None], thresh,
        valid=None if valid is None else valid[None],
        offset=offset, interpret=interpret, order_mode=order_mode,
    )[0]
