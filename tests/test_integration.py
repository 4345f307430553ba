"""End-to-end integration: train AZ-Net on synthetic data, recall improves.

This is the framework's "does the whole loop actually work" test
(SURVEY.md §4: search-loop tests on synthetic images with planted objects):
data -> labels -> minibatch -> compiled train step -> im_propose -> recall.
"""

import numpy as np
import jax

from aznet_tpu.config import Config, cfg_from_dict
from aznet_tpu.api import build_az_net, im_propose
from aznet_tpu.data.synthetic import SyntheticImdb
from aznet_tpu.eval.detection import evaluate_recall
from aznet_tpu.train.loop import train_az_net

CFG = cfg_from_dict(
    Config(),
    {
        "MODEL": {"BACKBONE": "smallnet", "FC_DIM": 64, "NUM_TEMPLATES": 11,
                  "NUM_CLASSES": 4, "COMPUTE_DTYPE": "float32", "DROPOUT": 0.0},
        "TRAIN": {"SCALES": [96], "MAX_SIZE": 128, "REGIONS_PER_IMAGE": 48,
                  "IMS_PER_BATCH": 2, "LEARNING_RATE": 0.005, "STEPSIZE": 10000,
                  "GRAD_CLIP": 10.0, "SNAPSHOT_ITERS": 10000,
                  "USE_FLIPPED": False},
        "TEST": {"SCALES": [96], "MAX_SIZE": 128},
        "SEAR": {"FRONTIER_CAP": 32, "CAND_BUF": 512, "MAX_LEVELS": 3,
                 "NUM_PROPOSALS": 100, "ZOOM_THRESH": 0.3,
                 "CONF_THRESH": 0.05, "MIN_SIZE": 12.0},
    },
)


def test_train_improves_recall(tmp_path):
    train_imdb = SyntheticImdb(split="train", seed=0, num_images=24)
    test_imdb = SyntheticImdb(split="test", seed=2, num_images=8)

    untrained = build_az_net(CFG)
    table0 = evaluate_recall(untrained, test_imdb, top_ks=(100,))
    r0 = table0[100][0.5]

    state, model, outdir = train_az_net(
        CFG, "synthetic_train", max_iters=300, output_dir=str(tmp_path),
        imdb=train_imdb,
    )
    # Evaluate with the normalization baked into the regression head — the
    # reference's snapshot-time convention (training targets are normalized;
    # the search decodes raw head outputs).
    from aznet_tpu.utils.checkpoint import bake_bbox_normalization

    baked = bake_bbox_normalization(
        jax.device_get(state.params),
        CFG.TRAIN.BBOX_NORMALIZE_MEANS, CFG.TRAIN.BBOX_NORMALIZE_STDS,
        "adj_bbox",
    )
    trained = build_az_net(CFG, params=baked)
    table1 = evaluate_recall(trained, test_imdb, top_ks=(100,))
    r1 = table1[100][0.5]

    print(f"recall@100 IoU0.5: untrained={r0:.3f} trained={r1:.3f}")
    assert r1 > r0 + 0.15, (r0, r1)
    assert r1 >= 0.3, r1
