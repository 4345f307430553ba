"""Zoom-search: device while_loop vs NumPy oracle equivalence + properties."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from aznet_tpu.config import ModelConfig, SearchConfig
from aznet_tpu.models import AZNet
from aznet_tpu.search import az_search, az_search_oracle, init_frontier
from aznet_tpu.search.templates import adjacency_templates, template_boxes, divide_regions

SMALL = ModelConfig(BACKBONE="smallnet", FC_DIM=32, NUM_TEMPLATES=5,
                    COMPUTE_DTYPE="float32", POOLING_MODE="align")
SCFG = SearchConfig(FRONTIER_CAP=32, CAND_BUF=256, MAX_LEVELS=3,
                    NUM_PROPOSALS=20, ZOOM_THRESH=0.2, MIN_SIZE=8.0,
                    CONF_THRESH=0.05, NMS_THRESH=0.7, SEED_LEVELS=1)


def _setup(seed=0, h=96, w=128):
    model = AZNet(model_cfg=SMALL)
    rng = np.random.RandomState(seed)
    images = jnp.asarray(rng.uniform(-1, 1, (1, h, w, 3)).astype(np.float32))
    rois0 = jnp.array([[0.0, 0.0, 63.0, 63.0]])
    params = model.init(jax.random.PRNGKey(seed), images, rois0)
    feat = model.apply(params, images, method="features")[0]

    def roi_fwd(f, r):
        return model.apply(params, f, r, method="roi_forward")

    return feat, roi_fwd, (h, w)


def test_templates_geometry():
    t = np.asarray(adjacency_templates(11))
    assert t.shape == (11, 4)
    region = jnp.array([[10.0, 20.0, 109.0, 219.0]])  # w=100, h=200
    boxes = np.asarray(template_boxes(region))
    np.testing.assert_allclose(boxes[0, 0], [10, 20, 109, 219])  # identity
    np.testing.assert_allclose(boxes[0, 1], [10, 20, 59, 219])  # left half
    np.testing.assert_allclose(boxes[0, 9], [35, 70, 84, 169])  # center


def test_divide_regions_geometry():
    region = jnp.array([[0.0, 0.0, 99.0, 99.0]])
    kids = np.asarray(divide_regions(region))
    assert kids.shape == (1, 5, 4)
    np.testing.assert_allclose(kids[0, 0], [0, 0, 49, 49])
    np.testing.assert_allclose(kids[0, 3], [50, 50, 99, 99])
    np.testing.assert_allclose(kids[0, 4], [25, 25, 74, 74])


def test_init_frontier():
    boxes, valid = init_frontier(100, 200, SCFG)
    assert boxes.shape == (32, 4)
    assert int(valid.sum()) == 6  # whole + 5 children
    np.testing.assert_allclose(np.asarray(boxes[0]), [0, 0, 199, 99])
    with pytest.raises(ValueError):
        init_frontier(100, 100, SearchConfig(FRONTIER_CAP=4, SEED_LEVELS=1))


def test_device_matches_oracle():
    feat, roi_fwd, hw = _setup(seed=3)
    boxes, scores, valid = jax.jit(
        lambda f: az_search(roi_fwd, f, hw, SCFG, num_templates=5)
    )(feat)
    nv = int(valid.sum())
    ob, osc = az_search_oracle(
        lambda f, r: roi_fwd(jnp.asarray(f), jnp.asarray(r)),
        np.asarray(feat), hw, SCFG, num_templates=5,
    )
    assert nv == len(osc), (nv, len(osc))
    np.testing.assert_allclose(np.asarray(scores[:nv]), osc, atol=1e-4)
    np.testing.assert_allclose(np.asarray(boxes[:nv]), ob, atol=0.1)


def test_capped_equals_uncapped_when_caps_large():
    feat, roi_fwd, hw = _setup(seed=5)
    big = SearchConfig(FRONTIER_CAP=512, CAND_BUF=4096, MAX_LEVELS=3,
                       NUM_PROPOSALS=20, ZOOM_THRESH=0.2, MIN_SIZE=8.0,
                       CONF_THRESH=0.05, NMS_THRESH=0.7, SEED_LEVELS=1)
    f_np = np.asarray(feat)
    fwd_np = lambda f, r: roi_fwd(jnp.asarray(f), jnp.asarray(r))
    b1, s1 = az_search_oracle(fwd_np, f_np, hw, big, num_templates=5, capped=True)
    b2, s2 = az_search_oracle(fwd_np, f_np, hw, big, num_templates=5, capped=False)
    np.testing.assert_allclose(s1, s2, atol=1e-6)
    np.testing.assert_allclose(b1, b2, atol=1e-4)


def test_search_respects_max_levels():
    feat, roi_fwd, hw = _setup(seed=7)
    shallow = SearchConfig(FRONTIER_CAP=32, CAND_BUF=256, MAX_LEVELS=1,
                           NUM_PROPOSALS=20, ZOOM_THRESH=0.2, MIN_SIZE=8.0,
                           CONF_THRESH=0.05, NMS_THRESH=0.7, SEED_LEVELS=1)
    boxes, scores, valid = az_search(roi_fwd, feat, hw, shallow, num_templates=5)
    ob, osc = az_search_oracle(
        lambda f, r: roi_fwd(jnp.asarray(f), jnp.asarray(r)),
        np.asarray(feat), hw, shallow, num_templates=5,
    )
    nv = int(valid.sum())
    assert nv == len(osc)
    np.testing.assert_allclose(np.asarray(scores[:nv]), osc, atol=1e-4)


def test_search_zoom_gate_closes():
    # Impossible zoom threshold: only seed-level candidates are produced.
    feat, roi_fwd, hw = _setup(seed=9)
    no_zoom = SearchConfig(FRONTIER_CAP=32, CAND_BUF=256, MAX_LEVELS=5,
                           NUM_PROPOSALS=20, ZOOM_THRESH=1.1, MIN_SIZE=8.0,
                           CONF_THRESH=0.05, NMS_THRESH=0.7, SEED_LEVELS=1)
    boxes, scores, valid = az_search(roi_fwd, feat, hw, no_zoom, num_templates=5)
    ob, osc = az_search_oracle(
        lambda f, r: roi_fwd(jnp.asarray(f), jnp.asarray(r)),
        np.asarray(feat), hw, no_zoom, num_templates=5,
    )
    nv = int(valid.sum())
    assert nv == len(osc)
    np.testing.assert_allclose(np.asarray(scores[:nv]), osc, atol=1e-4)


def test_search_boxes_inside_image():
    feat, roi_fwd, hw = _setup(seed=11)
    boxes, scores, valid = az_search(roi_fwd, feat, hw, SCFG, num_templates=5)
    b = np.asarray(boxes)[np.asarray(valid)]
    assert (b[:, 0] >= 0).all() and (b[:, 1] >= 0).all()
    assert (b[:, 2] <= hw[1] - 1).all() and (b[:, 3] <= hw[0] - 1).all()
    assert (b[:, 2] >= b[:, 0]).all() and (b[:, 3] >= b[:, 1]).all()


def test_search_vmap_batch():
    model = AZNet(model_cfg=SMALL)
    rng = np.random.RandomState(13)
    images = jnp.asarray(rng.uniform(-1, 1, (2, 96, 128, 3)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), images[:1], jnp.array([[0.0, 0.0, 63.0, 63.0]]))
    feats = model.apply(params, images, method="features")

    def roi_fwd(f, r):
        return model.apply(params, f, r, method="roi_forward")

    def one(feat):
        return az_search(roi_fwd, feat, (96, 128), SCFG, num_templates=5)

    boxes, scores, valid = jax.jit(jax.vmap(one))(feats)
    assert boxes.shape == (2, 20, 4)
    # Each lane must match its single-image run.
    for i in range(2):
        b1, s1, v1 = jax.jit(one)(feats[i])
        np.testing.assert_allclose(np.asarray(scores[i]), np.asarray(s1), atol=1e-5)


def test_deep_tree_finds_small_objects():
    # COCO-regime property (BASELINE config 4): a small object is reachable
    # only with enough zoom levels. An idealized head (zoom fires on regions
    # containing the gt, adjacency = the raw template anchors) makes this
    # deterministic: anchors can reach IoU>=0.5 with a 20px gt only once
    # regions are small enough, which requires depth.
    # 32px gt aligned to the division grid of a 512px image: the TL-quadrant
    # anchor of the level-reachable 64px region hits it exactly, and that
    # region only enters the frontier after 2 zoom rounds.
    gt = jnp.asarray([128.0, 128.0, 159.0, 159.0])
    K = 11

    def ideal_head(feat, rois):
        from aznet_tpu.ops.iou import intersection_over_area

        contains = intersection_over_area(gt[None], rois)[0]  # [R]
        size = jnp.minimum(rois[:, 2] - rois[:, 0], rois[:, 3] - rois[:, 1]) + 1
        needs_zoom = (contains > 0.9) & (size > 2 * 32.0)
        zoom = jnp.where(needs_zoom, 10.0, -10.0)
        adj = jnp.full((rois.shape[0], K), 2.0)  # all anchors, conf ~0.88
        deltas = jnp.zeros((rois.shape[0], K, 4))
        return {"zoom": zoom, "adj_score": adj, "adj_delta": deltas}

    feat = jnp.zeros((32, 32, 8))

    def run(levels):
        scfg = SearchConfig(FRONTIER_CAP=64, CAND_BUF=8192, MAX_LEVELS=levels,
                            NUM_PROPOSALS=2000, ZOOM_THRESH=0.5, MIN_SIZE=8.0,
                            CONF_THRESH=0.05, NMS_THRESH=0.95, SEED_LEVELS=1)
        boxes, scores, valid = az_search(ideal_head, feat, (512, 512), scfg,
                                         num_templates=K)
        from aznet_tpu.ops.iou import bbox_overlaps

        iou = bbox_overlaps(gt[None], boxes[valid])
        return float(iou.max()) if int(valid.sum()) else 0.0

    assert run(2) < 0.5, "shallow tree should NOT localize the small object"
    assert run(4) >= 0.5, "deep tree must localize the small object"


def test_device_matches_oracle_with_div_overlap():
    import dataclasses

    feat, roi_fwd, hw = _setup(seed=17)
    scfg = dataclasses.replace(SCFG, DIV_OVERLAP=0.3)
    boxes, scores, valid = az_search(roi_fwd, feat, hw, scfg, num_templates=5)
    ob, osc = az_search_oracle(
        lambda f, r: roi_fwd(jnp.asarray(f), jnp.asarray(r)),
        np.asarray(feat), hw, scfg, num_templates=5,
    )
    nv = int(valid.sum())
    assert nv == len(osc)
    np.testing.assert_allclose(np.asarray(scores[:nv]), osc, atol=1e-4)


def test_collect_frontier_consistent():
    """collect_frontier=True returns identical proposals + the visited
    frontier regions (level-0 block == the static seeds)."""
    feat, roi_fwd, hw = _setup(seed=11)
    b0, s0, v0 = jax.jit(
        lambda f: az_search(roi_fwd, f, hw, SCFG, num_templates=5))(feat)
    b1, s1, v1, vis, vok = jax.jit(
        lambda f: az_search(roi_fwd, f, hw, SCFG, num_templates=5,
                            collect_frontier=True))(feat)
    np.testing.assert_array_equal(np.asarray(v0), np.asarray(v1))
    np.testing.assert_allclose(np.asarray(b0), np.asarray(b1))
    np.testing.assert_allclose(np.asarray(s0), np.asarray(s1))
    assert vis.shape == (SCFG.MAX_LEVELS * SCFG.FRONTIER_CAP, 4)
    vis, vok = np.asarray(vis), np.asarray(vok)
    # Level-0 block = the seeds: whole image first.
    assert vok[:6].all()
    np.testing.assert_allclose(vis[0], [0, 0, hw[1] - 1, hw[0] - 1])
    # Visited regions are inside the image.
    assert (vis[vok][:, 2] <= hw[1] - 1 + 1e-3).all()
    assert (vis[vok][:, 3] <= hw[0] - 1 + 1e-3).all()


def test_region_miner_harvest():
    from aznet_tpu.config import Config, cfg_from_dict
    from aznet_tpu.data.synthetic import SyntheticImdb
    from aznet_tpu.models import AZNet
    from aznet_tpu.train.mining import RegionMiner

    cfg = cfg_from_dict(Config(), {
        "MODEL": {"BACKBONE": "smallnet", "FC_DIM": 32, "NUM_TEMPLATES": 5,
                  "COMPUTE_DTYPE": "float32"},
        "SEAR": {"FRONTIER_CAP": 16, "CAND_BUF": 128, "MAX_LEVELS": 3,
                 "NUM_PROPOSALS": 10, "ZOOM_THRESH": 0.1},
        "TRAIN": {"SCALES": (64,), "MAX_SIZE": 96, "MINE_INTERVAL": 1,
                  "MINE_IMAGES": 4},
    })
    imdb = SyntheticImdb(num_images=4)
    model = AZNet(model_cfg=cfg.MODEL)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 64, 64, 3)),
                        jnp.array([[0.0, 0.0, 31.0, 31.0]]))
    miner = RegionMiner(model, cfg, imdb, list(range(4)), batch_size=2)
    n = miner.harvest(params)
    assert n == 4
    assert set(miner.cache.keys()) == {0, 1, 2, 3}
    for i, v in miner.cache.items():
        assert v.ndim == 2 and v.shape[1] == 4
        if v.size:  # original-coordinate boxes inside the raw image
            e = imdb.roidb[i]
            assert v[:, 2].max() <= e["width"] and v[:, 3].max() <= e["height"]
