"""Regression tests for the BASELINE config-4/5 experiment files.

BASELINE.md configs: (4) COCO deep-zoom tree, (5) ResNet-50 multi-scale
1080p. These tests load the ACTUAL experiment YAMLs (so key drift fails
loudly) and run the propose path with the configs' search topology —
deep tree / deep frontier / N=1000 — at reduced image scale and model
width so they stay CPU-fast. The full-scale throughput numbers live in
bench.py presets (AZNET_BENCH_PRESET=coco_deep / resnet50_1080p) and
DESIGN.md.
"""

import os

import numpy as np

from aznet_tpu.config import Config, cfg_from_file, cfg_from_dict
from aznet_tpu.api import build_az_net, im_propose

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CFGS = os.path.join(REPO, "experiments", "cfgs")

_SHRINK = {
    "MODEL": {"WIDTH": 0.05, "FC_DIM": 64, "COMPUTE_DTYPE": "float32"},
    "TEST": {"SCALES": (96,), "MAX_SIZE": 160},
}


def test_coco_deep_tree_config():
    cfg = cfg_from_file(Config(), os.path.join(CFGS, "coco_deep_tree.yml"))
    # The knobs that define config 4 (deep tree, small-object regime).
    assert cfg.SEAR.MAX_LEVELS == 8
    assert cfg.SEAR.MIN_SIZE == 8.0
    assert cfg.SEAR.FRONTIER_CAP == 128
    assert cfg.SEAR.NUM_PROPOSALS == 1000
    assert cfg.MODEL.NUM_CLASSES == 81

    small = cfg_from_dict(cfg, _SHRINK)
    # Deep tree at a small canvas: MIN_SIZE terminates the search before
    # MAX_LEVELS; the pipeline must still produce <= N valid proposals.
    net = build_az_net(small)
    im = np.random.RandomState(0).randint(0, 255, (120, 160, 3), np.uint8)
    props = im_propose(net, im)
    assert props.shape[1] == 5
    assert 0 < props.shape[0] <= 1000
    assert (props[:, 0] >= 0).all() and (props[:, 2] <= 160).all()


def test_resnet50_1080p_config():
    cfg = cfg_from_file(Config(), os.path.join(CFGS, "resnet50_1080p.yml"))
    assert cfg.MODEL.BACKBONE == "resnet50"
    assert cfg.TEST.SCALES == (1080,)
    assert cfg.TEST.MAX_SIZE == 1920
    assert cfg.SEAR.MAX_LEVELS == 7
    assert cfg.SEAR.NUM_PROPOSALS == 1000
    assert len(cfg.TRAIN.SCALES) == 3  # multi-scale training

    small = cfg_from_dict(
        cfg, {"MODEL": {"FC_DIM": 64, "COMPUTE_DTYPE": "float32"},
              "TEST": {"SCALES": (64,), "MAX_SIZE": 96},
              "SEAR": {"FRONTIER_CAP": 16, "CAND_BUF": 512,
                       "NUM_PROPOSALS": 50}})
    net = build_az_net(small)
    im = np.random.RandomState(1).randint(0, 255, (96, 128, 3), np.uint8)
    props = im_propose(net, im)
    assert props.shape[1] == 5 and 0 < props.shape[0] <= 50


def test_all_experiment_cfgs_load():
    """Every YAML under experiments/cfgs type-checks against the schema
    (catches key drift in newly added configs, e.g. the fork's small-net
    variants az_caffenet_voc / az_vgg_cnn_m_1024_voc)."""
    import glob

    files = sorted(glob.glob(os.path.join(CFGS, "*.yml")))
    assert len(files) >= 9
    for f in files:
        cfg = cfg_from_file(Config(), f)
        assert cfg.SEAR.NUM_PROPOSALS > 0, f


def test_small_net_voc_cfgs_propose():
    """The fork's small-net configs drive the propose path end to end."""
    for name, backbone, fc7 in [
        ("az_caffenet_voc.yml", "caffenet", 0),
        ("az_vgg_cnn_m_1024_voc.yml", "vgg_cnn_m_1024", 1024),
    ]:
        cfg = cfg_from_file(Config(), os.path.join(CFGS, name))
        assert cfg.MODEL.BACKBONE == backbone
        assert cfg.MODEL.POOL_SIZE == 6
        assert cfg.MODEL.FC7_DIM == fc7
        small = cfg_from_dict(
            cfg, {"MODEL": {"FC_DIM": 64, "FC7_DIM": min(fc7, 32),
                            "COMPUTE_DTYPE": "float32"},
                  "TEST": {"SCALES": (64,), "MAX_SIZE": 96},
                  "SEAR": {"FRONTIER_CAP": 16, "CAND_BUF": 512,
                           "MAX_LEVELS": 3, "NUM_PROPOSALS": 50}})
        net = build_az_net(small)
        im = np.random.RandomState(2).randint(0, 255, (96, 128, 3), np.uint8)
        props = im_propose(net, im)
        assert props.shape[1] == 5 and 0 < props.shape[0] <= 50, name
