"""PASCAL VOC and COCO dataset paths, exercised on fabricated mini-datasets."""

import json
import os

import numpy as np
import pytest

VOC_XML = """<annotation>
  <size><width>{w}</width><height>{h}</height><depth>3</depth></size>
  {objects}
</annotation>"""

VOC_OBJ = """<object>
    <name>{name}</name><difficult>{difficult}</difficult>
    <bndbox><xmin>{x1}</xmin><ymin>{y1}</ymin><xmax>{x2}</xmax><ymax>{y2}</ymax></bndbox>
  </object>"""


def _make_voc(root, year="2007"):
    base = os.path.join(root, f"VOCdevkit{year}", f"VOC{year}")
    for sub in ("ImageSets/Main", "Annotations", "JPEGImages"):
        os.makedirs(os.path.join(base, sub), exist_ok=True)
    from PIL import Image

    entries = {
        "000001": [("dog", 47, 239, 194, 370, 0), ("person", 7, 11, 351, 497, 0)],
        "000002": [("car", 139, 200, 207, 301, 0), ("car", 50, 57, 120, 150, 1)],
    }
    with open(os.path.join(base, "ImageSets/Main/test.txt"), "w") as f:
        f.write("\n".join(entries) + "\n")
    rng = np.random.RandomState(0)
    for idx, objs in entries.items():
        Image.fromarray(rng.randint(0, 255, (500, 400, 3), dtype=np.uint8)).save(
            os.path.join(base, "JPEGImages", f"{idx}.jpg"))
        parts = "".join(
            VOC_OBJ.format(name=n, x1=x1, y1=y1, x2=x2, y2=y2, difficult=d)
            for n, x1, y1, x2, y2, d in objs
        )
        with open(os.path.join(base, "Annotations", f"{idx}.xml"), "w") as f:
            f.write(VOC_XML.format(w=400, h=500, objects=parts))
    return entries


def test_pascal_voc_roidb_and_eval(tmp_path, monkeypatch):
    monkeypatch.setenv("AZNET_DATA_DIR", str(tmp_path))
    _make_voc(tmp_path)
    from aznet_tpu.data.voc import PascalVOC, VOC_CLASSES

    imdb = PascalVOC("test", "2007", cache_dir=str(tmp_path / "cache"))
    assert imdb.num_images == 2
    roidb = imdb.roidb
    # 0-indexed conversion: xml xmin 47 -> 46.
    assert roidb[0]["boxes"][0, 0] == 46.0
    assert roidb[0]["gt_classes"][0] == VOC_CLASSES.index("dog")
    # difficult object kept with its flag (eval needs it present to ignore)
    assert roidb[1]["boxes"].shape[0] == 2
    assert list(roidb[1]["difficult"]) == [False, True]
    im = imdb.image_array(roidb[0])
    assert im.shape == (500, 400, 3)

    # roidb cache round-trip
    imdb2 = PascalVOC("test", "2007", cache_dir=str(tmp_path / "cache"))
    assert len(imdb2.roidb) == 2

    # Perfect detections -> mAP 1 on the two visible classes.
    n = imdb.num_classes
    empty = np.zeros((0, 5), np.float32)
    all_boxes = [[empty, empty] for _ in range(n)]
    dog = VOC_CLASSES.index("dog")
    person = VOC_CLASSES.index("person")
    car = VOC_CLASSES.index("car")
    all_boxes[dog][0] = np.array([[46, 238, 193, 369, 0.9]], np.float32)
    all_boxes[person][0] = np.array([[6, 10, 350, 496, 0.8]], np.float32)
    all_boxes[car][1] = np.array([[138, 199, 206, 300, 0.95]], np.float32)
    aps = imdb.evaluate_detections(all_boxes, str(tmp_path / "results"))
    assert aps["dog"] == pytest.approx(1.0)
    assert aps["person"] == pytest.approx(1.0)
    assert aps["car"] == pytest.approx(1.0)
    # Results files exist in VOC format, 1-indexed.
    det_file = tmp_path / "results" / "det_test_dog.txt"
    line = det_file.read_text().strip().split()
    assert line[0] == "000001" and float(line[2]) == 47.0


def test_pascal_voc_flipped_aug(tmp_path, monkeypatch):
    monkeypatch.setenv("AZNET_DATA_DIR", str(tmp_path))
    _make_voc(tmp_path)
    from aznet_tpu.data.voc import PascalVOC

    imdb = PascalVOC("test", "2007", cache_dir=str(tmp_path / "cache2"))
    n = imdb.num_images
    imdb.append_flipped_images()
    assert len(imdb.roidb) == 2 * n
    orig, flip = imdb.roidb[0], imdb.roidb[n]
    w = orig["width"]
    np.testing.assert_allclose(flip["boxes"][:, 0], w - orig["boxes"][:, 2] - 1)


def _make_coco(root):
    ann_dir = os.path.join(root, "coco", "annotations")
    img_dir = os.path.join(root, "coco", "val2017")
    os.makedirs(ann_dir, exist_ok=True)
    os.makedirs(img_dir, exist_ok=True)
    data = {
        "images": [
            {"id": 1, "file_name": "000001.jpg", "height": 100, "width": 200},
            {"id": 2, "file_name": "000002.jpg", "height": 120, "width": 160},
        ],
        "categories": [
            {"id": 3, "name": "car"}, {"id": 7, "name": "dog"},
        ],
        "annotations": [
            {"id": 10, "image_id": 1, "category_id": 3,
             "bbox": [10.0, 20.0, 50.0, 30.0], "iscrowd": 0},
            {"id": 11, "image_id": 1, "category_id": 7,
             "bbox": [0.0, 0.0, 20.0, 20.0], "iscrowd": 0},
            {"id": 12, "image_id": 2, "category_id": 3,
             "bbox": [5.0, 5.0, 100.0, 100.0], "iscrowd": 1},  # crowd: skipped
        ],
    }
    with open(os.path.join(ann_dir, "instances_val2017.json"), "w") as f:
        json.dump(data, f)


def test_coco_imdb(tmp_path, monkeypatch):
    monkeypatch.setenv("AZNET_DATA_DIR", str(tmp_path))
    _make_coco(tmp_path)
    from aznet_tpu.data.coco import COCOImdb, coco_data_available

    assert coco_data_available("val2017")
    imdb = COCOImdb("val2017")
    assert imdb.num_images == 2
    assert imdb.classes == ["__background__", "car", "dog"]
    e0 = imdb.roidb[0]
    # xywh -> x1y1x2y2 inclusive
    np.testing.assert_allclose(e0["boxes"][0], [10, 20, 59, 49])
    assert e0["gt_classes"][0] == 1  # car
    # crowd annotation kept as an IGNORE region: present in the roidb with
    # crowd+difficult flags (absorbed in eval, excluded from training).
    e1 = imdb.roidb[1]
    assert e1["boxes"].shape[0] == 1
    assert e1["crowd"][0] and e1["difficult"][0]
    assert not e0["crowd"].any()


def test_voc_end_to_end_train_eval(tmp_path, monkeypatch):
    # The full VOC chain on the fabricated devkit: gt roidb -> AZ training ->
    # proposals -> detection eval writing VOC-format results files.
    monkeypatch.setenv("AZNET_DATA_DIR", str(tmp_path))
    _make_voc(tmp_path)
    from aznet_tpu.config import Config, cfg_from_dict
    from aznet_tpu.data.voc import PascalVOC
    from aznet_tpu.train.loop import train_az_net
    from aznet_tpu.api import build_az_net, build_frcnn_net
    from aznet_tpu.eval.detection import detect_all

    cfg = cfg_from_dict(
        Config(),
        {
            "MODEL": {"BACKBONE": "smallnet", "FC_DIM": 32, "NUM_TEMPLATES": 5,
                      "NUM_CLASSES": 21, "COMPUTE_DTYPE": "float32"},
            "TRAIN": {"SCALES": [96], "MAX_SIZE": 128, "REGIONS_PER_IMAGE": 16,
                      "IMS_PER_BATCH": 2, "LEARNING_RATE": 0.001,
                      "GRAD_CLIP": 5.0, "USE_FLIPPED": True,
                      "SNAPSHOT_ITERS": 100},
            "TEST": {"SCALES": [96], "MAX_SIZE": 128},
            "SEAR": {"FRONTIER_CAP": 16, "CAND_BUF": 128, "MAX_LEVELS": 2,
                     "NUM_PROPOSALS": 20},
        },
    )
    imdb = PascalVOC("test", "2007", cache_dir=str(tmp_path / "cache3"))
    state, model, outdir = train_az_net(
        cfg, "voc_2007_test", max_iters=5, output_dir=str(tmp_path / "az"),
        imdb=imdb,
    )
    assert int(state.step) == 5

    az = build_az_net(cfg, params=None)
    frcnn = build_frcnn_net(cfg)
    eval_imdb = PascalVOC("test", "2007", cache_dir=str(tmp_path / "cache3"))
    all_boxes = detect_all(az, frcnn, eval_imdb)
    aps = eval_imdb.evaluate_detections(all_boxes, str(tmp_path / "res"))
    assert "mAP" in aps and np.isfinite(aps["mAP"])
    assert os.path.exists(tmp_path / "res" / "det_test_dog.txt")
