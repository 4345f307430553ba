"""Config tree: defaults, YAML merge, KEY VALUE overrides, immutability."""

import dataclasses

import pytest

from aznet_tpu.config import Config, cfg_from_dict, cfg_from_file, cfg_from_list, cfg_to_dict


def test_defaults_match_reference_conventions():
    cfg = Config()
    assert cfg.PIXEL_MEANS == (102.9801, 115.9465, 122.7717)  # BGR, Caffe exact
    assert cfg.TRAIN.SCALES == (600,)
    assert cfg.TRAIN.MAX_SIZE == 1000
    assert cfg.TRAIN.FG_FRACTION == 0.25
    assert cfg.RNG_SEED == 3
    assert cfg.BOX_OFFSET == 1.0


def test_frozen_and_hashable():
    cfg = Config()
    with pytest.raises(dataclasses.FrozenInstanceError):
        cfg.RNG_SEED = 4  # type: ignore[misc]
    hash(cfg)  # usable as a jit static argument


def test_cfg_from_dict_merge():
    cfg = cfg_from_dict(Config(), {"SEAR": {"NUM_PROPOSALS": 1000}, "RNG_SEED": 7})
    assert cfg.SEAR.NUM_PROPOSALS == 1000
    assert cfg.RNG_SEED == 7
    assert cfg.SEAR.ZOOM_THRESH == Config().SEAR.ZOOM_THRESH  # untouched


def test_cfg_from_dict_rejects_unknown_and_bad_type():
    with pytest.raises(KeyError):
        cfg_from_dict(Config(), {"SEAR": {"NO_SUCH_KEY": 1}})
    with pytest.raises(TypeError):
        cfg_from_dict(Config(), {"SEAR": {"MAX_LEVELS": 2.5}})


def test_cfg_from_file(tmp_path):
    p = tmp_path / "exp.yml"
    p.write_text("SEAR:\n  MAX_LEVELS: 8\nTRAIN:\n  SCALES: [480, 600]\n")
    cfg = cfg_from_file(Config(), str(p))
    assert cfg.SEAR.MAX_LEVELS == 8
    assert cfg.TRAIN.SCALES == (480, 600)


def test_cfg_from_list():
    cfg = cfg_from_list(Config(), ["SEAR.NUM_PROPOSALS", "100", "MODEL.BACKBONE", "resnet50"])
    assert cfg.SEAR.NUM_PROPOSALS == 100
    assert cfg.MODEL.BACKBONE == "resnet50"


def test_roundtrip_dict():
    d = cfg_to_dict(Config())
    assert d["SEAR"]["NUM_PROPOSALS"] == 300
    cfg = cfg_from_dict(Config(), d)
    assert cfg == Config()
