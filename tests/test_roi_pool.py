"""ROI pooling: Caffe-parity vs a direct NumPy transcription + align props."""

import numpy as np
import jax
import jax.numpy as jnp

from aznet_tpu.ops.roi_pool import (
    roi_pool_caffe,
    roi_pool_caffe_reference_np,
    roi_align,
    roi_pool,
)


def _rand_feat_rois(rng, h=14, w=18, c=8, r=12, stride=16):
    feat = rng.uniform(-1, 1, (h, w, c)).astype(np.float32)
    xy = rng.uniform(0, (w - 2) * stride, (r, 1)), rng.uniform(0, (h - 2) * stride, (r, 1))
    x1 = rng.uniform(0, (w - 2) * stride, (r, 1))
    y1 = rng.uniform(0, (h - 2) * stride, (r, 1))
    x2 = x1 + rng.uniform(stride, (w * stride) / 2, (r, 1))
    y2 = y1 + rng.uniform(stride, (h * stride) / 2, (r, 1))
    rois = np.concatenate([x1, y1, np.minimum(x2, w * stride - 1), np.minimum(y2, h * stride - 1)], 1)
    return feat, rois.astype(np.float32)


def test_caffe_parity_random():
    rng = np.random.RandomState(3)
    feat, rois = _rand_feat_rois(rng)
    got = np.asarray(roi_pool_caffe(jnp.asarray(feat), jnp.asarray(rois), 1.0 / 16, 7))
    want = roi_pool_caffe_reference_np(feat, rois, 1.0 / 16, 7)
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_caffe_parity_small_pool():
    rng = np.random.RandomState(11)
    feat, rois = _rand_feat_rois(rng, h=9, w=9, c=4, r=20)
    got = np.asarray(roi_pool_caffe(jnp.asarray(feat), jnp.asarray(rois), 1.0 / 16, 3))
    want = roi_pool_caffe_reference_np(feat, rois, 1.0 / 16, 3)
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_caffe_tiny_roi():
    # ROI smaller than the pooled grid: rounding makes many bins share cells;
    # empty bins output 0 exactly as the CUDA kernel does.
    feat = np.arange(5 * 5 * 1, dtype=np.float32).reshape(5, 5, 1)
    rois = np.array([[16.0, 16.0, 17.0, 17.0]], np.float32)  # ~1 feature cell
    got = np.asarray(roi_pool_caffe(jnp.asarray(feat), jnp.asarray(rois), 1.0 / 16, 7))
    want = roi_pool_caffe_reference_np(feat, rois, 1.0 / 16, 7)
    np.testing.assert_allclose(got, want)


def test_align_constant_feature():
    feat = jnp.full((10, 12, 4), 3.5)
    rois = jnp.array([[10.0, 10.0, 100.0, 80.0]])
    out = np.asarray(roi_align(feat, rois, 1.0 / 16, 7))
    np.testing.assert_allclose(out, 3.5, atol=1e-5)


def test_align_gradient_flows():
    feat = jnp.ones((8, 8, 2))
    rois = jnp.array([[0.0, 0.0, 100.0, 100.0]])

    def f(x):
        return roi_align(x, rois, 1.0 / 16, 4).sum()

    g = np.asarray(jax.grad(f)(feat))
    assert np.isfinite(g).all()
    assert g.sum() > 0  # gradient reaches the feature map


def test_align_linear_ramp_centers():
    # Feature = x coordinate; pooling a roi aligned to cells should return
    # the sampled x centers (bilinear of a linear fn is exact).
    h, w = 16, 16
    feat = np.tile(np.arange(w, dtype=np.float32)[None, :, None], (h, 1, 1))
    # roi covering feature cols [2, 10) at stride 16 (offset=0 convention).
    rois = jnp.array([[32.0, 32.0, 160.0, 160.0]])
    out = np.asarray(roi_align(jnp.asarray(feat), rois, 1.0 / 16, 4, sampling=1))[0, :, :, 0]
    # 4 bins over [2,10): bin centers at 3, 5, 7, 9
    np.testing.assert_allclose(out[0], [3.0, 5.0, 7.0, 9.0], atol=1e-4)
    # rows identical (x-ramp)
    np.testing.assert_allclose(out, np.tile(out[:1], (4, 1)), atol=1e-5)


def test_dispatch_and_jit():
    rng = np.random.RandomState(5)
    feat, rois = _rand_feat_rois(rng, r=5)
    out = jax.jit(
        lambda f, r: roi_pool(f, r, 1.0 / 16, 7, mode="align")
    )(jnp.asarray(feat), jnp.asarray(rois))
    assert out.shape == (5, 7, 7, 8)
    out2 = jax.jit(
        lambda f, r: roi_pool(f, r, 1.0 / 16, 7, mode="caffe_max")
    )(jnp.asarray(feat), jnp.asarray(rois))
    assert out2.shape == (5, 7, 7, 8)


def test_align_contraction_order_equivalence():
    """W-first vs H-first separable contraction: same math, different
    staging (the big-map HBM heuristic, DESIGN.md round-4). f32 features
    make the two association orders agree to float tolerance."""
    from aznet_tpu.ops.roi_pool import _contract_w_first, roi_align

    rng = np.random.RandomState(5)
    feat = jnp.asarray(rng.uniform(-2, 2, (20, 34, 16)).astype(np.float32))
    r = 32
    x1 = rng.uniform(0, 30 * 16, r)
    y1 = rng.uniform(0, 16 * 16, r)
    rois = jnp.asarray(np.stack(
        [x1, y1, x1 + rng.uniform(16, 200, r), y1 + rng.uniform(16, 150, r)],
        1), jnp.float32)
    a = np.asarray(roi_align(feat, rois, 1 / 16.0, w_first=False))
    b = np.asarray(roi_align(feat, rois, 1 / 16.0, w_first=True))
    np.testing.assert_allclose(a, b, rtol=2e-5, atol=2e-5)

    # heuristic: only big, wide maps swap; itemsize matters
    assert not _contract_w_first(38, 50, 512, 2, None)      # VOC VGG: small
    assert _contract_w_first(68, 120, 1024, 2, None)        # 1080p ResNet
    assert not _contract_w_first(120, 68, 1024, 2, None)    # tall: H first
    assert _contract_w_first(38, 50, 512, 2, True)          # pin wins


def test_align_int8_contraction_order_equivalence():
    from aznet_tpu.ops.roi_pool import roi_align_int8

    rng = np.random.RandomState(6)
    feat8 = jnp.asarray(rng.randint(-127, 128, (20, 34, 16)).astype(np.int8))
    r = 32
    x1 = rng.uniform(0, 30 * 16, r)
    y1 = rng.uniform(0, 16 * 16, r)
    rois = jnp.asarray(np.stack(
        [x1, y1, x1 + rng.uniform(16, 200, r), y1 + rng.uniform(16, 150, r)],
        1), jnp.float32)
    a = np.asarray(roi_align_int8(feat8, rois, 1 / 16.0, w_first=False))
    b = np.asarray(roi_align_int8(feat8, rois, 1 / 16.0, w_first=True))
    # each order quantizes a DIFFERENT weight matrix to int8, so agreement
    # is bounded by the documented weight-quant budget, not exact
    assert np.abs(a.astype(np.float32) - b.astype(np.float32)).max() <= 3.5
