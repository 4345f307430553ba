"""Preprocessing: scale rule parity, resize correctness, fused device path."""

import numpy as np
import jax
import jax.numpy as jnp

from aznet_tpu.ops.preprocess import (
    compute_scale,
    resize_bilinear_scale,
    preprocess_image,
    prep_im_for_blob,
    im_list_to_blob,
    _resize_bilinear_np,
)

MEANS = (102.9801, 115.9465, 122.7717)


def test_compute_scale_reference_rule():
    # shortest side 375 -> 600: scale 1.6; longest 500*1.6=800 <= 1000 OK
    assert abs(compute_scale(375, 500, 600, 1000) - 1.6) < 1e-9
    # cap: 400x1000 -> scale 1.5 would give 1500 > 1000 -> scale = 1.0
    assert compute_scale(400, 1000, 600, 1000) == 1.0


def test_resize_identity_scale():
    rng = np.random.RandomState(3)
    im = rng.uniform(0, 255, (16, 20, 3)).astype(np.float32)
    out, vh, vw = resize_bilinear_scale(jnp.asarray(im), 1.0, 24, 28)
    assert int(vh) == 16 and int(vw) == 20
    np.testing.assert_allclose(np.asarray(out)[:16, :20], im, atol=1e-4)
    # padding region is zero
    assert np.all(np.asarray(out)[16:] == 0)
    assert np.all(np.asarray(out)[:, 20:] == 0)


def test_resize_2x_matches_numpy_halfpixel():
    rng = np.random.RandomState(5)
    im = rng.uniform(0, 255, (8, 10, 3)).astype(np.float32)
    out, vh, vw = resize_bilinear_scale(jnp.asarray(im), 2.0, 16, 20)
    want = _resize_bilinear_np(im, 16, 20)
    np.testing.assert_allclose(np.asarray(out), want, atol=1e-3)


def test_resize_constant_image_preserved():
    im = np.full((10, 10, 3), 7.0, np.float32)
    out, vh, vw = resize_bilinear_scale(jnp.asarray(im), 1.7, 17, 17)
    np.testing.assert_allclose(np.asarray(out)[:17, :17], 7.0, atol=1e-4)


def test_preprocess_image_fused():
    rng = np.random.RandomState(7)
    im = rng.randint(0, 256, (375, 500, 3)).astype(np.uint8)
    blob, scale, (vh, vw) = jax.jit(
        lambda x: preprocess_image(x, MEANS, 600, 1000, 640, 832)
    )(jnp.asarray(im))
    assert abs(float(scale) - 1.6) < 1e-6
    assert int(vh) == 600 and int(vw) == 800
    # Host parity path
    host_im, host_scale = prep_im_for_blob(im, MEANS, 600, 1000)
    assert host_scale == 1.6
    assert host_im.shape == (600, 800, 3)
    np.testing.assert_allclose(
        np.asarray(blob)[:600, :800], host_im, atol=0.5
    )  # interpolation convention match (loose: separate code paths)


def test_im_list_to_blob_padding():
    a = np.ones((4, 6, 3), np.float32)
    b = np.ones((5, 3, 3), np.float32) * 2
    blob = im_list_to_blob([a, b])
    assert blob.shape == (2, 5, 6, 3)
    assert blob[0, 4].sum() == 0  # padded row
    assert blob[1, 0, 3:].sum() == 0  # padded cols
