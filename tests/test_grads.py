"""Gradient checks (the reference's GradientChecker role, SURVEY.md §4).

Caffe's C++ tests finite-difference every layer's backward; here
jax.test_util.check_grads does the same for the ops with custom structure
(ROI align's weight construction, smooth-L1's piecewise form, the decode).
"""

import numpy as np
import jax
import jax.numpy as jnp
from jax.test_util import check_grads

from aznet_tpu.ops.roi_pool import roi_align
from aznet_tpu.ops.losses import smooth_l1_loss, sigmoid_ce_loss
from aznet_tpu.ops.boxes import bbox_transform_inv
from aznet_tpu.ops.preprocess import resize_bilinear_scale


def test_roi_align_grads():
    rng = np.random.RandomState(3)
    feat = jnp.asarray(rng.randn(8, 10, 4).astype(np.float32))
    rois = jnp.asarray([[10.0, 10.0, 90.0, 70.0], [0.0, 0.0, 150.0, 120.0]])
    check_grads(lambda f: roi_align(f, rois, 1.0 / 16, 3).sum(),
                (feat,), order=1, modes=["rev"], atol=1e-2, rtol=1e-2)


def test_smooth_l1_grads_both_zones():
    rng = np.random.RandomState(5)
    # Values straddling the quadratic/linear boundary (avoid the kink itself).
    pred = jnp.asarray(np.concatenate([rng.uniform(-0.8, 0.8, 8),
                                       rng.uniform(1.5, 3.0, 8)]).astype(np.float32))
    target = jnp.zeros(16)
    check_grads(lambda p: smooth_l1_loss(p, target), (pred,), order=1,
                modes=["rev"], atol=1e-2, rtol=1e-2)


def test_sigmoid_ce_grads():
    rng = np.random.RandomState(7)
    logits = jnp.asarray(rng.randn(12).astype(np.float32))
    labels = jnp.asarray((rng.rand(12) > 0.5).astype(np.float32))
    check_grads(lambda x: sigmoid_ce_loss(x, labels), (logits,), order=2,
                modes=["rev"], atol=1e-2, rtol=1e-2)


def test_decode_grads():
    boxes = jnp.asarray([[0.0, 0.0, 9.0, 19.0], [5.0, 5.0, 30.0, 40.0]])
    deltas = jnp.asarray(np.random.RandomState(9).randn(2, 4).astype(np.float32) * 0.1)
    check_grads(lambda d: bbox_transform_inv(boxes, d).sum(), (deltas,),
                order=1, modes=["rev"], atol=1e-2, rtol=1e-2)


def test_resize_grads():
    rng = np.random.RandomState(11)
    im = jnp.asarray(rng.randn(6, 8, 2).astype(np.float32))
    check_grads(
        lambda x: resize_bilinear_scale(x, 1.5, 9, 12)[0].sum(), (im,),
        order=1, modes=["rev"], atol=1e-2, rtol=1e-2)


def test_full_az_loss_grads_finite():
    from aznet_tpu.config import Config, cfg_from_dict
    from aznet_tpu.models import AZNet
    from aznet_tpu.train import make_az_train_state, az_loss

    cfg = cfg_from_dict(Config(), {"MODEL": {"BACKBONE": "smallnet", "FC_DIM": 16,
                                             "NUM_TEMPLATES": 3,
                                             "COMPUTE_DTYPE": "float32"}})
    model = AZNet(model_cfg=cfg.MODEL)
    state = make_az_train_state(cfg, model, jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    batch = {
        "images": jnp.asarray(rng.uniform(-1, 1, (1, 64, 64, 3)).astype(np.float32)),
        "rois": jnp.asarray([[[0.0, 0.0, 40.0, 40.0], [8.0, 8.0, 56.0, 56.0]]]),
        "roi_valid": jnp.ones((1, 2), bool),
        "zoom_labels": jnp.asarray([[1.0, 0.0]]),
        "adj_labels": jnp.asarray(rng.randint(0, 2, (1, 2, 3)).astype(np.float32)),
        "adj_targets": jnp.asarray(rng.randn(1, 2, 3, 4).astype(np.float32) * 0.1),
        "adj_inside": jnp.ones((1, 2, 3, 4), jnp.float32),
    }
    grads = jax.grad(lambda p: az_loss(model, p, batch)[0])(state.params)
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
    assert any(np.abs(np.asarray(g)).sum() > 0 for g in leaves)
