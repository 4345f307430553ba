"""Datasets, label generation, minibatch sampling."""

import numpy as np
import pytest

from aznet_tpu.config import Config, cfg_from_dict
from aznet_tpu.data import get_imdb, list_imdbs
from aznet_tpu.data.synthetic import SyntheticImdb, make_image
from aznet_tpu.train.labels import (
    az_labels_for_regions,
    division_tree_regions,
    perturb_gt_regions,
    sample_az_regions,
)
from aznet_tpu.data.minibatch import get_az_minibatch, get_frcnn_minibatch
from aznet_tpu.search.templates import adjacency_templates

CFG = cfg_from_dict(
    Config(),
    {
        "MODEL": {"BACKBONE": "smallnet", "NUM_TEMPLATES": 5, "NUM_CLASSES": 4},
        "TRAIN": {"SCALES": [96], "MAX_SIZE": 160, "REGIONS_PER_IMAGE": 32,
                  "BATCH_SIZE": 32, "IMS_PER_BATCH": 2},
    },
)


def test_synthetic_imdb_deterministic():
    a = SyntheticImdb(num_images=4)
    b = SyntheticImdb(num_images=4)
    np.testing.assert_array_equal(a.roidb[0]["image"], b.roidb[0]["image"])
    np.testing.assert_array_equal(a.roidb[0]["boxes"], b.roidb[0]["boxes"])
    assert a.roidb[0]["boxes"].shape[1] == 4
    assert (a.roidb[0]["gt_classes"] >= 1).all()


def test_factory():
    names = list_imdbs()
    assert "synthetic_train" in names and "voc_2007_test" in names
    imdb = get_imdb("synthetic_val")
    assert imdb.num_images == 16
    with pytest.raises(KeyError):
        get_imdb("imagenet_2030")


def test_append_flipped():
    imdb = SyntheticImdb(num_images=3)
    n = len(imdb.roidb)
    imdb.append_flipped_images()
    assert len(imdb.roidb) == 2 * n
    orig, flip = imdb.roidb[0], imdb.roidb[n]
    w = orig["width"]
    np.testing.assert_allclose(flip["boxes"][:, 0], w - orig["boxes"][:, 2] - 1)
    im_o = imdb.image_array(orig)
    im_f = imdb.image_array(flip)
    np.testing.assert_array_equal(im_f, im_o[:, ::-1])


def test_division_tree_counts():
    regions = division_tree_regions((100, 100), levels=2)
    assert regions.shape == (31, 4)  # 1 + 5 + 25
    # All within image.
    assert regions.min() >= 0 and regions.max() <= 99


def test_zoom_label_rule():
    tcfg = CFG.TRAIN
    templates = np.asarray(adjacency_templates(5))
    region = np.array([[0, 0, 99, 99]], np.float32)
    # Small contained gt -> zoom 1.
    small_gt = np.array([[10, 10, 29, 29]], np.float32)  # area 400 / 10000 < 0.25
    lab = az_labels_for_regions(region, small_gt, tcfg, templates)
    assert lab["zoom_labels"][0] == 1.0
    # Large contained gt -> zoom 0.
    big_gt = np.array([[10, 10, 89, 89]], np.float32)  # area 6400 / 10000 > 0.25
    lab = az_labels_for_regions(region, big_gt, tcfg, templates)
    assert lab["zoom_labels"][0] == 0.0
    # Small gt OUTSIDE the region -> zoom 0.
    far_gt = np.array([[500, 500, 519, 519]], np.float32)
    lab = az_labels_for_regions(region, far_gt, tcfg, templates)
    assert lab["zoom_labels"][0] == 0.0


def test_adjacency_label_rule():
    tcfg = CFG.TRAIN
    templates = np.asarray(adjacency_templates(5))
    region = np.array([[0, 0, 99, 99]], np.float32)
    # gt == left half template (template 1) -> that template is positive.
    gt = np.array([[0, 0, 49, 99]], np.float32)
    lab = az_labels_for_regions(region, gt, tcfg, templates)
    assert lab["adj_labels"][0, 1] == 1.0
    assert lab["adj_inside"][0, 1].sum() == 4.0
    # Its (normalized) regression target is ~(0 - means)/stds.
    means = np.asarray(tcfg.BBOX_NORMALIZE_MEANS)
    stds = np.asarray(tcfg.BBOX_NORMALIZE_STDS)
    np.testing.assert_allclose(
        lab["adj_targets"][0, 1], (0 - means) / stds, atol=1e-5
    )
    # Empty gt: all zeros.
    lab0 = az_labels_for_regions(region, np.zeros((0, 4), np.float32), tcfg, templates)
    assert lab0["adj_labels"].sum() == 0 and lab0["zoom_labels"].sum() == 0


def test_sample_az_regions_budget():
    rng = np.random.RandomState(0)
    gt = np.array([[10, 10, 50, 50], [100, 60, 180, 120]], np.float32)
    regions = sample_az_regions(gt, (192, 256), CFG.TRAIN, rng)
    assert regions.shape == (CFG.TRAIN.REGIONS_PER_IMAGE, 4)


def test_az_minibatch_shapes():
    imdb = SyntheticImdb(num_images=4)
    rng = np.random.RandomState(0)
    batch = get_az_minibatch(imdb, imdb.roidb[:2], CFG, rng)
    b, r, k = 2, CFG.TRAIN.REGIONS_PER_IMAGE, CFG.MODEL.NUM_TEMPLATES
    assert batch["images"].shape[0] == 2
    assert batch["images"].shape[1] % 32 == 0 and batch["images"].shape[2] % 32 == 0
    assert batch["rois"].shape == (b, r, 4)
    assert batch["adj_targets"].shape == (b, r, k, 4)
    assert batch["roi_valid"].any()
    # Some positive labels exist (gt boxes are large and well-covered).
    assert batch["adj_labels"].sum() > 0
    assert np.isfinite(batch["adj_targets"]).all()


def test_frcnn_minibatch_sampling():
    imdb = SyntheticImdb(num_images=4)
    rng = np.random.RandomState(1)
    entries = imdb.roidb[:2]
    # Proposals: gt jittered + randoms (unscaled original coords).
    props = []
    for e in entries:
        jit = perturb_gt_regions(e["boxes"], (e["height"], e["width"]), 10, rng)
        rand = np.concatenate(
            [rng.uniform(0, 128, (20, 2)), rng.uniform(128, 250, (20, 2))], axis=1
        ).astype(np.float32)
        props.append(np.concatenate([jit, rand]))
    batch = get_frcnn_minibatch(imdb, entries, props, CFG, rng)
    r = CFG.TRAIN.BATCH_SIZE // CFG.TRAIN.IMS_PER_BATCH
    assert batch["labels"].shape == (2, r)
    assert batch["roi_valid"].all()
    # fg fraction respected: at most 25% positives.
    fg = (batch["labels"] > 0).sum(axis=1)
    assert (fg <= round(CFG.TRAIN.FG_FRACTION * r)).all()
    # fg rows have 4 inside-weight slots at the class position.
    b, i = np.nonzero(batch["labels"])
    if b.size:
        row = batch["bbox_inside"][b[0], i[0]]
        cls = batch["labels"][b[0], i[0]]
        assert row.sum() == 4.0
        assert row[4 * cls : 4 * cls + 4].sum() == 4.0


def test_frcnn_labels_with_difficult_gt():
    """Regression: difficult gt must be filtered from BOTH boxes and classes.

    Round-2 bug: `_prep_images` dropped difficult boxes but
    `get_frcnn_minibatch` passed the unfiltered `gt_classes` into
    `_sample_rois`, whose argmax indices are relative to the filtered box
    array — so any image with a difficult object trained on wrong labels.
    """
    imdb = SyntheticImdb(num_images=2)
    h, w = 64, 64
    entries = []
    for _ in range(2):
        entries.append(
            {
                "image": np.zeros((h, w, 3), np.uint8),
                "height": h,
                "width": w,
                # Difficult box FIRST (class 1) so a misindexed lookup reads
                # its class; the surviving gt is class 3.
                "boxes": np.array(
                    [[2, 2, 20, 20], [30, 30, 60, 60]], np.float32
                ),
                "gt_classes": np.array([1, 3], np.int32),
                "difficult": np.array([True, False]),
                "flipped": False,
            }
        )
    imdb._roidb = entries
    rng = np.random.RandomState(0)
    # Proposals tightly around the surviving gt -> every fg sample must be
    # labelled with ITS class (3), never the difficult box's class (1).
    props = [
        perturb_gt_regions(e["boxes"][1:2], (h, w), 3, rng) for e in entries
    ]
    batch = get_frcnn_minibatch(imdb, entries, props, CFG, rng)
    fg = batch["labels"][batch["labels"] > 0]
    assert fg.size > 0
    assert (fg == 3).all()


def test_compute_bbox_target_stats():
    from aznet_tpu.train.labels import compute_bbox_target_stats

    imdb = SyntheticImdb(num_images=8)
    means, stds = compute_bbox_target_stats(imdb, CFG, max_images=8)
    assert means.shape == (4,) and stds.shape == (4,)
    assert (stds > 0).all()
    # Targets of matched (IoU>=0.5) anchors are small: |mean| < 0.5, std < 1.
    assert np.abs(means).max() < 0.5
    assert stds.max() < 1.0
