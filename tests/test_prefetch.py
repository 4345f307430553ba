"""MPPrefetcher (data/prefetch.py): exact-order delivery, worker-count
invariance of the seeded batch stream, the FRCNN pkl spec path, and a
NUM_WORKERS>1 end-to-end training smoke run.

Reference role: the fast-rcnn lineage's BlobFetcher prefetch process
(SURVEY.md §3.3 — mount empty, no file:line exists), generalized to W
deterministic workers (DESIGN.md finding 30's host-bound fix).
"""

import pickle

import numpy as np

from aznet_tpu.config import Config, cfg_from_dict
from aznet_tpu.data.prefetch import (MPPrefetcher, az_batch_builder,
                                     frcnn_batch_builder, rng_for_batch)

CFG = cfg_from_dict(
    Config(),
    {
        "MODEL": {"BACKBONE": "smallnet", "FC_DIM": 32, "NUM_TEMPLATES": 11,
                  "NUM_CLASSES": 4, "COMPUTE_DTYPE": "float32", "DROPOUT": 0.0},
        "TRAIN": {"SCALES": [96], "MAX_SIZE": 128, "REGIONS_PER_IMAGE": 32,
                  "IMS_PER_BATCH": 2, "USE_FLIPPED": False,
                  "SNAPSHOT_ITERS": 10000},
        "TEST": {"SCALES": [96], "MAX_SIZE": 128},
    },
)


def _spec(cfg, **extra):
    args = {"imdb_name": "synthetic_train", "cfg": cfg, "seed": 7,
            "pid": 0, "pcount": 1, "ims_local": cfg.TRAIN.IMS_PER_BATCH}
    args.update(extra)
    return args


def _assert_batches_equal(want, got, t):
    assert sorted(want) == sorted(got), (t, sorted(want), sorted(got))
    for k in want:
        np.testing.assert_array_equal(
            np.asarray(want[k]), np.asarray(got[k]),
            err_msg=f"batch {t} key {k}")


def test_rng_for_batch_is_index_keyed():
    a = rng_for_batch(7, 3).randint(0, 1 << 30, size=4)
    b = rng_for_batch(7, 3).randint(0, 1 << 30, size=4)
    c = rng_for_batch(7, 4).randint(0, 1 << 30, size=4)
    np.testing.assert_array_equal(a, b)
    assert not np.array_equal(a, c)


def test_mp_stream_matches_serial_and_is_worker_count_invariant():
    args = _spec(CFG)
    serial = az_batch_builder(args)
    want = [serial(t) for t in range(4)]
    for workers in (2, 3):
        pf = MPPrefetcher(az_batch_builder, args, workers=workers)
        try:
            got = [pf.next() for _ in range(4)]
        finally:
            pf.close()
        for t, (wb, gb) in enumerate(zip(want, got)):
            _assert_batches_equal(wb, gb, t)


def test_frcnn_builder_spec_path(tmp_path):
    from aznet_tpu.data.imdb import get_imdb
    from aznet_tpu.train.labels import perturb_gt_regions

    imdb = get_imdb("synthetic_train")
    rng = np.random.RandomState(0)
    props = [perturb_gt_regions(e["boxes"], (e["height"], e["width"]), 8, rng)
             for e in imdb.roidb]
    pkl = tmp_path / "props.pkl"
    with open(pkl, "wb") as f:
        pickle.dump(props, f)

    args = _spec(CFG, proposals_path=str(pkl))
    serial = frcnn_batch_builder(args)
    want = [serial(t) for t in range(2)]
    pf = MPPrefetcher(frcnn_batch_builder, args, workers=2)
    try:
        got = [pf.next() for _ in range(2)]
    finally:
        pf.close()
    for t, (wb, gb) in enumerate(zip(want, got)):
        _assert_batches_equal(wb, gb, t)


def test_train_az_with_workers_smoke(tmp_path):
    """NUM_WORKERS=2 through train_az_net end-to-end (spawn, reorder,
    close) — finite losses, checkpoints written."""
    import jax

    from aznet_tpu.train.loop import train_az_net

    cfg = cfg_from_dict(CFG, {"TRAIN": {"NUM_WORKERS": 2,
                                        "LEARNING_RATE": 0.001}})
    state, model, outdir = train_az_net(
        cfg, "synthetic_train", max_iters=8, output_dir=str(tmp_path))
    leaves = jax.tree_util.tree_leaves(jax.device_get(state.params))
    assert all(np.isfinite(x).all() for x in leaves)


def test_frcnn_workers_fallback_without_path(capsys, tmp_path):
    """NUM_WORKERS>1 with a bare proposals_fn must fall back to the
    thread (and say so), not crash or silently drop proposals."""
    from aznet_tpu.data.imdb import get_imdb
    from aznet_tpu.train.loop import train_frcnn_net

    imdb = get_imdb("synthetic_train")
    cfg = cfg_from_dict(CFG, {"TRAIN": {"NUM_WORKERS": 2}})
    state, model, outdir = train_frcnn_net(
        cfg, "synthetic_train", lambda i: imdb.roidb[i % len(imdb.roidb)]["boxes"],
        max_iters=2, output_dir=str(tmp_path))
    out = capsys.readouterr().out
    assert "NUM_WORKERS ignored" in out
