"""Model shape/dtype tests on the small trunk (CPU-friendly sizes)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from aznet_tpu.config import ModelConfig
from aznet_tpu.models import AZNet, FRCNN, get_backbone

SMALL = ModelConfig(BACKBONE="smallnet", FC_DIM=64, NUM_TEMPLATES=5, NUM_CLASSES=4,
                    COMPUTE_DTYPE="float32")


def _init(model, h=64, w=64, r=3):
    images = jnp.ones((1, h, w, 3))  # nonzero so head outputs depend on input
    rois = jnp.array([[0.0, 0.0, 31.0, 31.0]] * r)
    params = model.init(jax.random.PRNGKey(0), images, rois)
    return params, images, rois


def test_aznet_shapes():
    model = AZNet(model_cfg=SMALL)
    params, images, rois = _init(model)
    out = model.apply(params, images, rois)
    assert out["zoom"].shape == (3,)
    assert out["adj_score"].shape == (3, 5)
    assert out["adj_delta"].shape == (3, 5, 4)
    assert out["zoom"].dtype == jnp.float32


def test_aznet_two_stage_equals_call():
    model = AZNet(model_cfg=SMALL)
    params, images, rois = _init(model)
    feat = model.apply(params, images, method="features")
    assert feat.shape == (1, 4, 4, 128)
    out2 = model.apply(params, feat[0], rois, method="roi_forward")
    out1 = model.apply(params, images, rois)
    np.testing.assert_allclose(np.asarray(out1["zoom"]), np.asarray(out2["zoom"]), atol=1e-6)


def test_frcnn_shapes():
    model = FRCNN(model_cfg=SMALL)
    params, images, rois = _init(model)
    out = model.apply(params, images, rois)
    assert out["cls_score"].shape == (3, 4)
    assert out["bbox_pred"].shape == (3, 16)


def test_fused_inference_heads_match_separate_dense():
    """The eval-time fused [fc7, sum-of-heads] dot == the separate Dense
    projections computed by hand from the same params (AZ and FRCNN)."""
    rng = np.random.RandomState(3)
    images = jnp.asarray(rng.uniform(-1, 1, (1, 64, 64, 3)).astype(np.float32))
    rois = jnp.asarray(rng.uniform(0, 40, (4, 4)).astype(np.float32))
    rois = rois.at[:, 2:].add(20.0)

    az = AZNet(model_cfg=SMALL)
    p = az.init(jax.random.PRNGKey(1), images, rois)
    feat = az.apply(p, images, method="features")[0]
    out = az.apply(p, feat, rois, method="roi_forward")  # train=False: fused
    pooled = az.apply(p, feat, rois, method="roi_pool_only")
    x = pooled.reshape(pooled.shape[0], -1)
    hp = p["params"]["head"]
    for name in ("fc6", "fc7"):
        x = jnp.maximum(
            x @ hp["fc"][name]["kernel"] + hp["fc"][name]["bias"], 0.0)
    for head, key, reshape in (("zoom_score", "zoom", lambda y: y[:, 0]),
                               ("adj_score", "adj_score", lambda y: y),
                               ("adj_bbox", "adj_delta",
                                lambda y: y.reshape(y.shape[0], -1, 4))):
        want = reshape(x @ hp[head]["kernel"] + hp[head]["bias"])
        np.testing.assert_allclose(np.asarray(out[key]), np.asarray(want),
                                   atol=1e-4, err_msg=head)

    fr = FRCNN(model_cfg=SMALL)
    pf = fr.init(jax.random.PRNGKey(2), images, rois)
    featf = fr.apply(pf, images, method="features")[0]
    outf = fr.apply(pf, featf, rois, method="roi_forward")
    pooledf = fr.apply(pf, featf, rois, method="roi_pool_only")
    xf = pooledf.reshape(pooledf.shape[0], -1)
    hpf = pf["params"]["head"]
    for name in ("fc6", "fc7"):
        xf = jnp.maximum(
            xf @ hpf["fc"][name]["kernel"] + hpf["fc"][name]["bias"], 0.0)
    for head, key in (("cls_score", "cls_score"), ("bbox_pred", "bbox_pred")):
        want = xf @ hpf[head]["kernel"] + hpf[head]["bias"]
        np.testing.assert_allclose(np.asarray(outf[key]), np.asarray(want),
                                   atol=1e-4, err_msg=head)


def test_dropout_train_mode_stochastic():
    model = AZNet(model_cfg=SMALL.__class__(**{**SMALL.__dict__, "DROPOUT": 0.9}))
    params, images, rois = _init(model)
    o1 = model.apply(params, images, rois, True, rngs={"dropout": jax.random.PRNGKey(1)})
    o2 = model.apply(params, images, rois, True, rngs={"dropout": jax.random.PRNGKey(2)})
    assert not np.allclose(np.asarray(o1["adj_score"]), np.asarray(o2["adj_score"]))
    # eval mode deterministic
    e1 = model.apply(params, images, rois)
    e2 = model.apply(params, images, rois)
    np.testing.assert_allclose(np.asarray(e1["adj_score"]), np.asarray(e2["adj_score"]))


def test_vgg16_structure():
    # Structure check only (params shapes), no forward (heavy on CPU).
    from aznet_tpu.models.vgg import VGG16Trunk

    trunk = VGG16Trunk(dtype=jnp.float32)
    params = jax.eval_shape(
        lambda: trunk.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    )
    p = params["params"]
    assert set(p) == {
        "conv1_1", "conv1_2", "conv2_1", "conv2_2", "conv3_1", "conv3_2", "conv3_3",
        "conv4_1", "conv4_2", "conv4_3", "conv5_1", "conv5_2", "conv5_3",
    }
    assert p["conv5_3"]["kernel"].shape == (3, 3, 512, 512)
    assert p["conv1_1"]["kernel"].shape == (3, 3, 3, 64)


def test_vgg16_stride16():
    from aznet_tpu.models.vgg import VGG16Trunk

    trunk = VGG16Trunk(dtype=jnp.float32)
    out = jax.eval_shape(
        lambda: trunk.init_with_output(jax.random.PRNGKey(0), jnp.zeros((1, 96, 64, 3)))[0]
    )
    assert out.shape == (1, 6, 4, 512)


def test_resnet50_stride16_and_channels():
    from aznet_tpu.models.resnet import ResNet50Trunk

    trunk = ResNet50Trunk(dtype=jnp.float32)
    out = jax.eval_shape(
        lambda: trunk.init_with_output(jax.random.PRNGKey(0), jnp.zeros((1, 64, 96, 3)))[0]
    )
    assert out.shape == (1, 4, 6, 1024)


def test_backbone_factory_rejects_unknown():
    with pytest.raises(ValueError):
        get_backbone(ModelConfig(BACKBONE="alexnet"))


def test_resnet50_aznet_propose_path():
    # BASELINE config 5 structure: ResNet-50 backbone swap through the full
    # propose path (small shapes, CPU).
    import dataclasses

    from aznet_tpu.config import SearchConfig
    from aznet_tpu.search import az_search

    cfg = ModelConfig(BACKBONE="resnet50", FC_DIM=32, NUM_TEMPLATES=5,
                      COMPUTE_DTYPE="float32")
    model = AZNet(model_cfg=cfg)
    images = jnp.ones((1, 64, 64, 3))
    rois = jnp.array([[0.0, 0.0, 31.0, 31.0]])
    params = model.init(jax.random.PRNGKey(0), images, rois)
    feat = model.apply(params, images, method="features")
    assert feat.shape == (1, 4, 4, 1024)
    scfg = SearchConfig(FRONTIER_CAP=8, CAND_BUF=64, MAX_LEVELS=2,
                        NUM_PROPOSALS=5, MIN_SIZE=8.0)
    boxes, scores, valid = az_search(
        lambda f, r: model.apply(params, f, r, method="roi_forward"),
        feat[0], (64, 64), scfg, num_templates=5)
    assert boxes.shape == (5, 4)
    assert np.isfinite(np.asarray(scores)[np.asarray(valid)]).all()


# ---------------------------------------------------------------------------
# Reference-lineage small nets: CaffeNet / VGG_CNN_M_1024 (SURVEY §2.1 [M])
# ---------------------------------------------------------------------------


def test_lrn_matches_numpy_reference():
    """Caffe ACROSS_CHANNELS LRN: alpha/n inside the window sum."""
    from aznet_tpu.models.small import lrn

    rng = np.random.RandomState(0)
    x = rng.normal(0, 2, (2, 3, 4, 7)).astype(np.float32)
    n, alpha, beta, k = 5, 1e-4, 0.75, 1.0
    want = np.empty_like(x)
    for c in range(7):
        lo, hi = max(0, c - n // 2), min(7, c + n // 2 + 1)
        ssum = (x[..., lo:hi] ** 2).sum(-1)
        want[..., c] = x[..., c] / (k + (alpha / n) * ssum) ** beta
    got = np.asarray(lrn(jnp.asarray(x), n, alpha, beta, k))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("backbone,out_ch,fc7", [
    ("caffenet", 256, 0),
    ("vgg_cnn_m_1024", 512, 1024),
])
def test_lineage_small_net_shapes(backbone, out_ch, fc7):
    """Both fork prototxt nets: stride-16 trunks, POOL_SIZE=6 heads; the
    M_1024 net's fc7 is 1024-wide (MODEL.FC7_DIM)."""
    mc = ModelConfig(BACKBONE=backbone, POOL_SIZE=6, FC_DIM=128,
                     FC7_DIM=min(fc7, 32), NUM_TEMPLATES=5, NUM_CLASSES=4,
                     COMPUTE_DTYPE="float32")
    model = AZNet(model_cfg=mc)
    params, images, rois = _init(model)
    feat = model.apply(params, images, method="features")
    assert feat.shape == (1, 4, 4, out_ch)  # 64/16 = 4: stride-16 contract
    out = model.apply(params, images, rois)
    assert out["adj_score"].shape == (3, 5)
    if fc7:
        fc7_kernel = params["params"]["head"]["fc"]["fc7"]["kernel"]
        assert fc7_kernel.shape == (128, 32)
    # FRCNN head over the same trunk
    det = FRCNN(model_cfg=mc)
    dp, dim, drois = _init(det)
    dout = det.apply(dp, dim, drois)
    assert dout["cls_score"].shape == (3, 4)


def test_caffe_ceil_mode_pool_shape():
    """3x3/2 pool with (0,1) padding == Caffe's ceil((H-3)/2)+1 sizes."""
    from aznet_tpu.models.small import _pool3x2

    for h in (7, 8, 9, 10):
        out = _pool3x2(jnp.zeros((1, h, h, 4)))
        want = -(-(h - 3) // 2) + 1  # ceil((h-3)/2) + 1
        assert out.shape[1] == want, (h, out.shape[1], want)


def test_resnet_stem_s2d_exact():
    """Space-to-depth stem (StemConv s2d=True) == the plain 7x7/s2 conv,
    term-identical math (same params, in-jit re-layout). Covers interior,
    all four borders (padding equivalence), and the odd-size fallback."""
    import jax
    from aznet_tpu.models.resnet import StemConv

    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.uniform(-2, 2, (2, 36, 44, 3)).astype(np.float32))
    plain = StemConv(dtype=jnp.float32, s2d=False)
    s2d = StemConv(dtype=jnp.float32, s2d=True)
    params = plain.init(jax.random.PRNGKey(0), x)
    a = np.asarray(plain.apply(params, x))
    b = np.asarray(s2d.apply(params, x))   # same params by construction
    assert a.shape == b.shape == (2, 18, 22, 64)
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)

    # odd input size: s2d module falls back to the plain conv path
    x_odd = jnp.asarray(rng.uniform(-2, 2, (1, 35, 44, 3)).astype(np.float32))
    np.testing.assert_allclose(np.asarray(s2d.apply(params, x_odd)),
                               np.asarray(plain.apply(params, x_odd)),
                               rtol=1e-6, atol=1e-6)

    # gradients flow through the re-layout (training path)
    g = jax.grad(lambda p: jnp.sum(s2d.apply(p, x) ** 2))(params)
    gk = np.asarray(g["params"]["kernel"])
    assert gk.shape == (7, 7, 3, 64) and np.isfinite(gk).all()
    g0 = jax.grad(lambda p: jnp.sum(plain.apply(p, x) ** 2))(params)
    np.testing.assert_allclose(gk, np.asarray(g0["params"]["kernel"]),
                               rtol=2e-4, atol=2e-4)


def test_resnet_trunk_s2d_matches_plain():
    from aznet_tpu.models.resnet import ResNet50Trunk

    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.uniform(-1, 1, (1, 64, 96, 3)).astype(np.float32))
    t_plain = ResNet50Trunk(dtype=jnp.float32, stem_s2d=False)
    t_s2d = ResNet50Trunk(dtype=jnp.float32, stem_s2d=True)
    params = t_plain.init(jax.random.PRNGKey(1), x)
    a = np.asarray(t_plain.apply(params, x))
    b = np.asarray(t_s2d.apply(params, x))
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4)


def test_vgg_conv1_s2d_exact():
    """conv1_1_s2d == the plain 3x3/s1 conv + bias + ReLU, term-identical
    (same [3,3,3,64]-layout params, in-jit re-layout). Covers interior and
    all four borders (the SAME-padding equivalence), plus the full-trunk
    flag wiring and the odd-size fallback."""
    from aznet_tpu.models.vgg import VGG16Trunk, conv1_1_s2d

    rng = np.random.RandomState(7)
    x = jnp.asarray(rng.uniform(-2, 2, (2, 12, 16, 3)).astype(np.float32))
    kernel = jnp.asarray(rng.randn(3, 3, 3, 8).astype(np.float32))
    bias = jnp.asarray(rng.randn(8).astype(np.float32))
    ref = jax.lax.conv_general_dilated(
        x, kernel, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    ref = np.maximum(np.asarray(ref) + np.asarray(bias), 0.0)
    got = np.asarray(conv1_1_s2d(x, kernel, bias, jnp.float32))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)

    # trunk wiring: conv1_s2d=True == default, post-init apply, even dims
    t_plain = VGG16Trunk(dtype=jnp.float32, width=0.125)
    t_s2d = VGG16Trunk(dtype=jnp.float32, width=0.125, conv1_s2d=True)
    xt = jnp.asarray(rng.uniform(-1, 1, (1, 32, 48, 3)).astype(np.float32))
    params = t_plain.init(jax.random.PRNGKey(0), xt)
    a = np.asarray(t_plain.apply(params, xt))
    b = np.asarray(t_s2d.apply(params, xt))
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4)

    # odd input: the flag is a no-op (falls back to the plain conv)
    x_odd = jnp.asarray(rng.uniform(-1, 1, (1, 31, 48, 3)).astype(np.float32))
    np.testing.assert_allclose(np.asarray(t_s2d.apply(params, x_odd)),
                               np.asarray(t_plain.apply(params, x_odd)),
                               rtol=1e-5, atol=1e-5)
