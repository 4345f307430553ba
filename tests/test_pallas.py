"""Pallas kernels vs host/pure-JAX oracles (interpreter mode on CPU)."""

import pytest
import numpy as np
import jax
import jax.numpy as jnp

from aznet_tpu.ops.nms import nms
from aznet_tpu.ops.pallas import nms_pallas


def _random_dets(rng, n, span=200.0):
    xy = rng.uniform(0, span, (n, 2))
    wh = rng.uniform(5, span / 2, (n, 2))
    scores = rng.permutation(n).astype(np.float32) / n
    return np.concatenate([xy, xy + wh, scores[:, None]], axis=1).astype(np.float32)


def test_nms_pallas_matches_oracle():
    rng = np.random.RandomState(3)
    for n in (60, 128, 300):
        dets = _random_dets(rng, n)
        for t in (0.3, 0.5, 0.7):
            want = np.zeros(n, bool)
            want[nms(dets, t)] = True
            got = np.asarray(
                nms_pallas(jnp.asarray(dets[:, :4]), jnp.asarray(dets[:, 4]),
                           t, interpret=True)
            )
            np.testing.assert_array_equal(got, want, err_msg=f"n={n} t={t}")


def test_nms_pallas_cross_tile_chain():
    # Chain spanning tile boundaries: A suppresses B (tile 0), B would have
    # suppressed C (tile 1) — C must survive.
    n = 130
    dets = np.zeros((n, 5), np.float32)
    rng = np.random.RandomState(7)
    # Fill with well-separated boxes.
    for i in range(n):
        dets[i] = [300 + 40 * i, 300, 320 + 40 * i, 320, 0.5 - i * 1e-3]
    dets[0] = [0, 0, 10, 10, 0.99]
    dets[1] = [5, 0, 15, 10, 0.98]
    dets[129] = [10, 0, 20, 10, 0.0]  # sorts last -> tile 2
    want = np.zeros(n, bool)
    want[nms(dets, 0.3)] = True
    got = np.asarray(
        nms_pallas(jnp.asarray(dets[:, :4]), jnp.asarray(dets[:, 4]), 0.3,
                   interpret=True)
    )
    np.testing.assert_array_equal(got, want)
    assert want[129]  # the chain survivor


def test_nms_pallas_with_padding_mask():
    rng = np.random.RandomState(11)
    dets = _random_dets(rng, 100)
    valid = np.ones(140, bool)
    valid[100:] = False
    padded = np.zeros((140, 5), np.float32)
    padded[:100] = dets
    got = np.asarray(
        nms_pallas(jnp.asarray(padded[:, :4]), jnp.asarray(padded[:, 4]),
                   0.5, valid=jnp.asarray(valid), interpret=True)
    )
    want = np.zeros(140, bool)
    want[nms(dets, 0.5)] = True
    np.testing.assert_array_equal(got, want)


def test_iou_pallas_matches_reference():
    from aznet_tpu.ops.pallas import bbox_overlaps_pallas
    from aznet_tpu.ops.iou import bbox_overlaps

    rng = np.random.RandomState(5)
    for n, k in ((50, 40), (128, 128), (200, 300)):
        a = rng.uniform(0, 500, (n, 4)).astype(np.float32)
        a[:, 2:] = a[:, :2] + rng.uniform(1, 200, (n, 2))
        b = rng.uniform(0, 500, (k, 4)).astype(np.float32)
        b[:, 2:] = b[:, :2] + rng.uniform(1, 200, (k, 2))
        got = np.asarray(bbox_overlaps_pallas(jnp.asarray(a), jnp.asarray(b),
                                              interpret=True))
        want = np.asarray(bbox_overlaps(jnp.asarray(a), jnp.asarray(b)))
        np.testing.assert_allclose(got, want, atol=1e-5, err_msg=f"{n}x{k}")


def test_roi_align_pallas_matches_reference():
    from aznet_tpu.ops.pallas.roi_kernel import roi_align_pallas
    from aznet_tpu.ops.roi_pool import roi_align

    rng = np.random.RandomState(7)
    feat = jnp.asarray(rng.randn(14, 18, 8).astype(np.float32))
    rois = rng.uniform(0, 200, (10, 4)).astype(np.float32)
    rois[:, 2:] = rois[:, :2] + rng.uniform(16, 100, (10, 2))
    got = np.asarray(roi_align_pallas(feat, jnp.asarray(rois), 1 / 16.0, 7,
                                      tile_r=8, interpret=True))
    want = np.asarray(roi_align(feat, jnp.asarray(rois), 1 / 16.0, 7))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_roi_align_pallas_big_matches_reference():
    """Tiled large-map kernel == XLA roi_align across multi-tile grids in
    every dimension (c-tiles, h-tiles incl. a padded tail, roi-tiles incl.
    padding rois) and under vmap (the search's per-image batching)."""
    import jax

    from aznet_tpu.ops.pallas.roi_kernel import roi_align_pallas_big
    from aznet_tpu.ops.roi_pool import roi_align

    rng = np.random.RandomState(9)
    h, w, c = 21, 26, 24  # h pads 21 -> 24 at tile_h=8; c tiles 3x
    feat = jnp.asarray(rng.randn(h, w, c).astype(np.float32))
    r = 21  # pads to 2 roi tiles of 16
    x1 = rng.uniform(0, (w - 3) * 16, r)
    y1 = rng.uniform(0, (h - 3) * 16, r)
    rois = np.stack([x1, y1, x1 + rng.uniform(16, 250, r),
                     y1 + rng.uniform(16, 250, r)], 1).astype(np.float32)
    got = np.asarray(roi_align_pallas_big(
        feat, jnp.asarray(rois), 1 / 16.0, 7, tile_r=16, tile_h=8,
        tile_c=8, interpret=True))
    want = np.asarray(roi_align(feat, jnp.asarray(rois), 1 / 16.0, 7,
                                w_first=True))
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)

    # vmap (leading batch grid dim) + the single-tile degenerate grid.
    feats = jnp.stack([feat, feat * 0.5 + 1.0])
    roisb = jnp.asarray(np.stack([rois, rois + 8.0]))
    gotb = np.asarray(jax.vmap(
        lambda f, rr: roi_align_pallas_big(f, rr, 1 / 16.0, 7, tile_r=32,
                                           tile_h=24, tile_c=24,
                                           interpret=True))(feats, roisb))
    wantb = np.asarray(jax.vmap(
        lambda f, rr: roi_align(f, rr, 1 / 16.0, 7, w_first=True))(
            feats, roisb))
    np.testing.assert_allclose(gotb, wantb, atol=1e-4, rtol=1e-4)


def test_roi_align_pallas_dispatches_big_maps():
    """The align_pallas entry point must route HBM-scale maps to the tiled
    kernel (the whole-map kernel would blow the VMEM budget there)."""
    from aznet_tpu.ops.pallas.roi_kernel import roi_align_pallas
    from aznet_tpu.ops.roi_pool import roi_align

    rng = np.random.RandomState(3)
    h, w, c = 34, 60, 512  # 4.2 MB f32 -> big-map path
    feat = jnp.asarray(rng.randn(h, w, c).astype(np.float32))
    rois = np.array([[0, 0, 900, 500], [64, 32, 400, 300]], np.float32)
    got = np.asarray(roi_align_pallas(feat, jnp.asarray(rois), 1 / 16.0, 7,
                                      interpret=True))
    want = np.asarray(roi_align(feat, jnp.asarray(rois), 1 / 16.0, 7,
                                w_first=True))
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_fused_conv1_pool_matches_xla():
    import flax.linen as nn
    from aznet_tpu.ops.pallas.conv1_kernel import fused_conv1_pool

    rng = np.random.RandomState(7)
    B, H, W, C = 2, 64, 48, 16
    x = jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32))
    w11 = jnp.asarray((rng.rand(3, 3, 3, C) - 0.5).astype(np.float32))
    b11 = jnp.asarray(rng.rand(C).astype(np.float32) * 0.1)
    w12 = jnp.asarray((rng.rand(3, 3, C, C) - 0.5).astype(np.float32) * 0.2)
    b12 = jnp.asarray(rng.rand(C).astype(np.float32) * 0.1)

    dn1 = jax.lax.conv_dimension_numbers(x.shape, w11.shape, ("NHWC", "HWIO", "NHWC"))
    y = jax.nn.relu(jax.lax.conv_general_dilated(
        x, w11, (1, 1), "SAME", dimension_numbers=dn1) + b11)
    dn2 = jax.lax.conv_dimension_numbers(y.shape, w12.shape, ("NHWC", "HWIO", "NHWC"))
    y = jax.nn.relu(jax.lax.conv_general_dilated(
        y, w12, (1, 1), "SAME", dimension_numbers=dn2) + b12)
    ref = nn.max_pool(y, (2, 2), strides=(2, 2))

    out = fused_conv1_pool(x, w11, b11, w12, b12, interpret=True)
    assert out.shape == (B, H // 2, W // 2, C)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


@pytest.mark.parametrize("tile,derive_sub,lane_gather,unpermute,order_mode", [
    (256, False, False, "scatter", "argsort"),
    (512, False, False, "scatter", "argsort"),
    (256, True, False, "scatter", "argsort"),
    (256, False, True, "scatter", "argsort"),
    (256, True, True, "scatter", "argsort"),
    (256, False, True, "gather", "argsort"),
    (256, True, False, "scatter", "intkey"),
    (256, False, True, "gather", "intkey")])
def test_nms_pallas_batched_matches_per_stream(tile, derive_sub, lane_gather,
                                               unpermute, order_mode):
    """Native multi-stream launch == independent per-stream greedy NMS.

    tile=512 is the bench default (the 16x4096 sweep winner); 256 covers
    the multi-tile cross-suppression path at this N. derive_sub /
    lane_gather / order_mode are the wrapper-cost variants — identical
    keep sets. Scores include heavy ties (quantized to 8 levels) plus
    signed zeros so the intkey two-key sort's index tie-break is actually
    exercised against the stable-argsort oracle order.
    """
    from aznet_tpu.ops.pallas.nms_kernel import nms_pallas_batched

    rng = np.random.RandomState(9)
    bsz, n = 3, 600
    xy = rng.uniform(0, 800, (bsz, n, 2)).astype(np.float32)
    wh = rng.uniform(5, 200, (bsz, n, 2)).astype(np.float32)
    boxes = np.concatenate([xy, xy + wh], -1)
    # Tie-heavy scores: 8 quantized levels -> ~75 ties per level per stream.
    scores = np.floor(rng.rand(bsz, n) * 8).astype(np.float32) / 8.0
    scores[0, :16] = -0.0  # signed zero vs +0.0 elsewhere in the tie pool
    keep = np.asarray(nms_pallas_batched(jnp.asarray(boxes),
                                         jnp.asarray(scores), 0.5,
                                         interpret=True, tile=tile,
                                         derive_sub=derive_sub,
                                         lane_gather=lane_gather,
                                         unpermute=unpermute,
                                         order_mode=order_mode))
    for b in range(bsz):
        dets = np.concatenate([boxes[b], scores[b][:, None]], -1)
        want = np.zeros(n, bool)
        want[nms(dets, 0.5)] = True
        np.testing.assert_array_equal(keep[b], want)


def test_nms_intkey_order_equals_stable_argsort_under_jit():
    """The intkey two-key integer sort must reproduce jnp.argsort(-s,
    stable=True) EXACTLY, including signed-zero ties, -inf invalid
    entries, and subnormals — and it must do so UNDER JIT, where XLA
    elides float-side -0.0 folds (the round-3 advisor bug: a jitted
    `s + 0.0` kept -0.0's distinct bit pattern alive in the key)."""
    from aznet_tpu.ops.pallas.nms_kernel import _descending_order

    rng = np.random.RandomState(3)
    tricky = np.array([-0.0, 0.0, -0.0, 0.0, 1.0, -1.0, -np.inf, np.inf,
                       1e-40, -1e-40, 0.5, 0.5, -0.0], np.float32)
    rows = [tricky,
            np.floor(rng.rand(13) * 4).astype(np.float32) - 2.0,
            np.full(13, -np.inf, np.float32),
            np.concatenate([np.full(6, 0.25, np.float32),
                            np.array([-0.0] * 4 + [0.0] * 3, np.float32)])]
    s = jnp.asarray(np.stack(rows))
    for fn in (_descending_order, jax.jit(_descending_order,
                                          static_argnums=1)):
        got = np.asarray(fn(s, "intkey"))
        want = np.asarray(fn(s, "argsort"))
        np.testing.assert_array_equal(got, want)
    # float64 falls back to the stable argsort (keys at f32 width would
    # merge sub-f32-precision distinctions).
    if jax.config.jax_enable_x64:  # pragma: no cover - x64 off in CI
        s64 = s.astype(jnp.float64)
        np.testing.assert_array_equal(
            np.asarray(_descending_order(s64, "intkey")),
            np.asarray(_descending_order(s64, "argsort")))


def test_conv3x3_int8_pallas_exact_and_vmap():
    """Strip-DMA int8 conv kernel == f32 conv on integer grids (interpret)."""
    from aznet_tpu.ops.conv_int8 import conv3x3_f32_reference
    from aznet_tpu.ops.pallas.conv_int8_kernel import conv3x3_int8_pallas

    rng = np.random.RandomState(4)
    x = rng.randint(-5, 6, (2, 13, 17, 8)).astype(np.float32)  # H % T != 0
    w = rng.randint(-3, 4, (3, 3, 8, 16)).astype(np.float32)
    b = rng.randint(-2, 3, (16,)).astype(np.float32)
    w9 = jnp.asarray(w.reshape(9, 8, 16), jnp.int8)
    sw = jnp.ones((16,), jnp.float32)
    ref = np.asarray(conv3x3_f32_reference(jnp.asarray(x), jnp.asarray(w),
                                           jnp.asarray(b)))
    y = conv3x3_int8_pallas(jnp.asarray(x, jnp.int8), 1.0, w9, sw,
                            jnp.asarray(b), out_dtype=jnp.float32,
                            interpret=True)
    np.testing.assert_array_equal(np.asarray(y), ref)
    # int8-output path stays within the quantization grid
    s_out = float(ref.max() / 127.0)
    y8 = conv3x3_int8_pallas(jnp.asarray(x, jnp.int8), 1.0, w9, sw,
                             jnp.asarray(b), s_out=s_out, interpret=True)
    assert y8.dtype == jnp.int8
    assert np.abs(np.asarray(y8, np.float32) * s_out - ref).max() < s_out
    # vmap folds into the kernel grid
    yv = jax.vmap(lambda xx: conv3x3_int8_pallas(
        xx[None], 1.0, w9, sw, jnp.asarray(b), out_dtype=jnp.float32,
        interpret=True)[0])(jnp.asarray(x, jnp.int8))
    np.testing.assert_array_equal(np.asarray(yv), ref)


def test_conv3x3_int8_chain_exact_and_halo():
    """Chain kernel == XLA int8 conv (+ pool) BIT-EXACTLY on integer grids
    with power-of-two requant scales (y * 2^-k == y / 2^k exactly), and
    the output halo (col 0, cols > w_out, rows >= h_out) is exactly zero
    — the contract the next chain layer's shifted dots rely on."""
    import flax.linen as nn
    from aznet_tpu.ops.conv_int8 import conv3x3_int8
    from aznet_tpu.ops.pallas.conv_int8_chain import (conv3x3_int8_chain,
                                                      halo_layout)

    rng = np.random.RandomState(7)
    c, co = 128, 128
    for (h, w, pool, t) in [(20, 24, True, 8), (13, 10, False, 8),
                            (8, 10, True, 8), (18, 18, True, 16)]:
        x = rng.randint(-5, 6, (2, h, w, c)).astype(np.int8)
        wts = rng.randint(-3, 4, (3, 3, c, co)).astype(np.float32)
        bias = rng.randint(-2, 3, (co,)).astype(np.float32)
        w9 = jnp.asarray(wts.reshape(9, c, co), jnp.int8)
        sw = jnp.ones((co,), jnp.float32)
        wq_dy = jnp.asarray(wts.reshape(3, 3 * c, co), jnp.int8)
        s_out = 64.0  # power of two: reciprocal multiply is exact
        ref = conv3x3_int8(jnp.asarray(x), 1.0, wq_dy, sw,
                           jnp.asarray(bias), s_out=s_out)
        if pool:
            ref = nn.max_pool(ref, (2, 2), strides=(2, 2))
        out = conv3x3_int8_chain(halo_layout(jnp.asarray(x)), 1.0, w9, sw,
                                 jnp.asarray(bias), h, w, s_out=s_out,
                                 pool=pool, t_rows=t, interpret=True)
        ho, wo = (h // 2, w // 2) if pool else (h, w)
        np.testing.assert_array_equal(np.asarray(out[:, :ho, 1:1 + wo]),
                                      np.asarray(ref))
        assert (np.asarray(out[:, :, 0]) == 0).all()
        assert (np.asarray(out[:, :, 1 + wo:]) == 0).all()
        assert (np.asarray(out[:, ho:]) == 0).all()


def test_conv3x3_int8_chain_exit_and_vmap():
    """Chain-exit (s_out=None) emits compact rows == the f32 conv on
    integer grids; vmap folds the mapped axis into the kernel grid."""
    from aznet_tpu.ops.conv_int8 import conv3x3_f32_reference
    from aznet_tpu.ops.pallas.conv_int8_chain import (conv3x3_int8_chain,
                                                      halo_layout)

    rng = np.random.RandomState(8)
    h, w, c, co = 11, 10, 128, 128
    x = rng.randint(-5, 6, (2, h, w, c)).astype(np.float32)
    wts = rng.randint(-3, 4, (3, 3, c, co)).astype(np.float32)
    bias = rng.randint(-2, 3, (co,)).astype(np.float32)
    w9 = jnp.asarray(wts.reshape(9, c, co), jnp.int8)
    sw = jnp.ones((co,), jnp.float32)
    ref = np.asarray(conv3x3_f32_reference(jnp.asarray(x), jnp.asarray(wts),
                                           jnp.asarray(bias)))
    xh = halo_layout(jnp.asarray(x, jnp.int8))
    out = conv3x3_int8_chain(xh, 1.0, w9, sw, jnp.asarray(bias), h, w,
                             s_out=None, out_dtype=jnp.float32, t_rows=8,
                             interpret=True)
    np.testing.assert_array_equal(np.asarray(out[:, :h]), ref)
    outv = jax.vmap(lambda xx: conv3x3_int8_chain(
        xx[None], 1.0, w9, sw, jnp.asarray(bias), h, w, s_out=None,
        out_dtype=jnp.float32, t_rows=8, interpret=True)[0])(xh)
    np.testing.assert_array_equal(np.asarray(outv[:, :h]), ref)


def test_bitonic_sort6_equals_stable_argsort():
    """The in-kernel bitonic network over (intkey, idx) must reproduce the
    stable score-descending argsort exactly — including signed-zero /
    subnormal ties and -inf invalid rows — and carry the coordinate
    planes through the same permutation."""
    from aznet_tpu.ops.pallas.nms_kernel import (_bitonic_sort6, _intkey_i32)

    rng = np.random.RandomState(5)
    for bsz, n in ((3, 128), (2, 256), (1, 1024)):
        s = np.floor(rng.rand(bsz, n) * 8).astype(np.float32) / 8.0
        s[0, : n // 8] = -0.0
        s[0, n // 8 : n // 4] = 1e-40  # subnormal: ties with 0.0 under FTZ
        s[:, -5:] = -np.inf  # invalid rows sort last
        coords = rng.rand(bsz, n, 4).astype(np.float32)
        iota = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32), (bsz, n))
        outs = _bitonic_sort6(_intkey_i32(jnp.asarray(s)), iota,
                              jnp.asarray(coords), interpret=True)
        skey, sidx = np.asarray(outs[0]), np.asarray(outs[1])
        scs = [np.asarray(o) for o in outs[2:]]
        # FTZ the subnormals the way the intkey does before the oracle.
        s_ftz = np.where(np.abs(s) < 1.2e-38, 0.0, s)
        want = np.argsort(-s_ftz, axis=1, kind="stable")
        np.testing.assert_array_equal(sidx, want)
        for k in range(4):
            np.testing.assert_array_equal(
                scs[k], np.take_along_axis(coords[..., k], want, axis=1))
        assert (np.diff(skey, axis=1) >= 0).all()  # ascending keys


def test_nms_bitonic_keep_equals_argsort_path():
    """order_mode='bitonic' == the argsort wrapper: same keep masks in
    original order, on tie-heavy scores and non-power-of-two N."""
    from aznet_tpu.ops.pallas.nms_kernel import nms_pallas_batched

    rng = np.random.RandomState(8)
    for bsz, n, tile in ((2, 512, 256), (2, 700, 128), (1, 1024, 256)):
        xy = rng.uniform(0, 900, (bsz, n, 2)).astype(np.float32)
        wh = rng.uniform(5, 200, (bsz, n, 2)).astype(np.float32)
        boxes = jnp.asarray(np.concatenate([xy, xy + wh], -1))
        s = np.floor(rng.rand(bsz, n) * 16).astype(np.float32) / 16.0
        s[0, :40] = -0.0
        valid = rng.rand(bsz, n) > 0.1
        got = np.asarray(nms_pallas_batched(
            boxes, jnp.asarray(s), 0.5, valid=jnp.asarray(valid),
            tile=tile, order_mode="bitonic", interpret=True))
        want = np.asarray(nms_pallas_batched(
            boxes, jnp.asarray(s), 0.5, valid=jnp.asarray(valid),
            tile=tile, order_mode="argsort", interpret=True))
        np.testing.assert_array_equal(got, want)
        # gather-unpermute flavor too
        got_g = np.asarray(nms_pallas_batched(
            boxes, jnp.asarray(s), 0.5, valid=jnp.asarray(valid),
            tile=tile, order_mode="bitonic", unpermute="gather",
            interpret=True))
        np.testing.assert_array_equal(got_g, want)
        # in-kernel bitonic unpermute (second 2-plane network): the fully
        # in-Pallas path must also land keep bits in original slots.
        got_b = np.asarray(nms_pallas_batched(
            boxes, jnp.asarray(s), 0.5, valid=jnp.asarray(valid),
            tile=tile, order_mode="bitonic", unpermute="bitonic",
            interpret=True))
        np.testing.assert_array_equal(got_b, want)
