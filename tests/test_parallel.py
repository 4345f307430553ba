"""Mesh sharding: DP+TP train step on the virtual 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from aznet_tpu.config import Config, cfg_from_dict
from aznet_tpu.models import AZNet
from aznet_tpu.parallel import make_mesh, batch_sharding, param_sharding, replicate
from aznet_tpu.train import make_az_train_state, make_az_train_step, az_loss

CFG = cfg_from_dict(
    Config(),
    {
        "MODEL": {"BACKBONE": "smallnet", "FC_DIM": 64, "NUM_TEMPLATES": 5,
                  "COMPUTE_DTYPE": "float32", "DROPOUT": 0.0},
        "TRAIN": {"LEARNING_RATE": 0.01},
    },
)


def _batch(rng, b=8, r=4, k=5):
    return {
        "images": jnp.asarray(rng.uniform(-1, 1, (b, 64, 64, 3)).astype(np.float32)),
        "rois": jnp.asarray(rng.uniform(0, 40, (b, r, 4)).astype(np.float32))
        .at[..., 2:].add(16.0),
        "roi_valid": jnp.ones((b, r), bool),
        "zoom_labels": jnp.asarray(rng.randint(0, 2, (b, r)).astype(np.float32)),
        "adj_labels": jnp.asarray(rng.randint(0, 2, (b, r, k)).astype(np.float32)),
        "adj_targets": jnp.asarray(rng.normal(0, 0.1, (b, r, k, 4)).astype(np.float32)),
        "adj_inside": jnp.ones((b, r, k, 4), jnp.float32),
    }


def test_mesh_shapes():
    mesh = make_mesh(8, model_parallel=2)
    assert mesh.devices.shape == (4, 2)
    assert mesh.axis_names == ("data", "model")


def test_param_sharding_rules():
    mesh = make_mesh(8, model_parallel=2)
    model = AZNet(model_cfg=CFG.MODEL)
    state = make_az_train_state(CFG, model, jax.random.PRNGKey(0))
    shardings = param_sharding(mesh, state.params)
    flat = jax.tree_util.tree_flatten_with_path(shardings)[0]
    fc6 = [s for p, s in flat if "fc6" in jax.tree_util.keystr(p) and "kernel" in jax.tree_util.keystr(p)]
    assert fc6 and fc6[0].spec == P(None, "model")
    conv = [s for p, s in flat if "conv1" in jax.tree_util.keystr(p) and "kernel" in jax.tree_util.keystr(p)]
    assert conv and conv[0].spec == P()


def test_sharded_step_matches_single_device():
    model = AZNet(model_cfg=CFG.MODEL)
    state = make_az_train_state(CFG, model, jax.random.PRNGKey(0))
    batch = _batch(np.random.RandomState(0))
    rng = jax.random.PRNGKey(7)
    step = make_az_train_step(model)

    # Single-device reference.
    s_ref, m_ref = jax.jit(step)(state, batch, rng)

    # DP(4) x TP(2) over the 8 virtual CPU devices.
    mesh = make_mesh(8, model_parallel=2)
    p_shard = param_sharding(mesh, state.params)
    state_sh = jax.device_put(
        state, jax.tree_util.tree_map(
            lambda _: replicate(mesh), state,
            is_leaf=lambda x: hasattr(x, "ndim"),
        ).replace(params=p_shard)
    )
    batch_sh = {
        k: jax.device_put(v, batch_sharding(mesh, v.ndim)) for k, v in batch.items()
    }
    with mesh:
        s_par, m_par = jax.jit(step)(state_sh, batch_sh, rng)

    np.testing.assert_allclose(
        float(m_ref["loss"]), float(m_par["loss"]), rtol=1e-4
    )
    # Updated params agree.
    ref_flat = jax.tree_util.tree_leaves(s_ref.params)
    par_flat = jax.tree_util.tree_leaves(jax.device_get(s_par.params))
    for a, b in zip(ref_flat, par_flat):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)


def test_sharded_propose_matches_single_device():
    from aznet_tpu.api import build_az_net, make_propose_batch
    from aznet_tpu.parallel.inference import make_sharded_propose
    from aznet_tpu.config import cfg_from_dict

    cfg = cfg_from_dict(
        Config(),
        {
            "MODEL": {"BACKBONE": "smallnet", "FC_DIM": 32, "NUM_TEMPLATES": 5,
                      "COMPUTE_DTYPE": "float32"},
            "SEAR": {"FRONTIER_CAP": 16, "CAND_BUF": 128, "MAX_LEVELS": 2,
                     "NUM_PROPOSALS": 10},
            "TEST": {"SCALES": [64], "MAX_SIZE": 128},
        },
    )
    net = build_az_net(cfg)
    mesh = make_mesh(8, model_parallel=1)
    canvas = (64, 128)
    sharded = make_sharded_propose(net.model, cfg, canvas, mesh)
    rng = np.random.RandomState(0)
    ims = jnp.asarray(rng.randint(0, 256, (8, 96, 128, 3)).astype(np.uint8))
    with mesh:
        boxes, scores, valid = sharded(net.params, ims)
    single = jax.jit(make_propose_batch(net.model, cfg, canvas))(net.params, ims)
    np.testing.assert_allclose(np.asarray(scores), np.asarray(single[1]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(boxes), np.asarray(single[0]), atol=1e-3)


def _propose_cfg():
    return cfg_from_dict(
        Config(),
        {
            "MODEL": {"BACKBONE": "smallnet", "FC_DIM": 32, "NUM_TEMPLATES": 5,
                      "COMPUTE_DTYPE": "float32"},
            "SEAR": {"FRONTIER_CAP": 16, "CAND_BUF": 128, "MAX_LEVELS": 2,
                     "NUM_PROPOSALS": 10},
            "TEST": {"SCALES": [64], "MAX_SIZE": 128},
        },
    )


def test_region_sharded_propose_matches_single_device():
    """Region parallelism (SURVEY §5.7's SP analog): the search frontier
    shards over 'model' WITHIN each image; results must equal unsharded."""
    from aznet_tpu.api import build_az_net, make_propose_batch
    from aznet_tpu.parallel.inference import make_sharded_propose
    from aznet_tpu.config import cfg_from_dict

    cfg = _propose_cfg()
    net = build_az_net(cfg)
    mesh = make_mesh(8, model_parallel=4)  # DP 2 x region-parallel 4
    canvas = (64, 128)
    sharded = make_sharded_propose(net.model, cfg, canvas, mesh,
                                   shard_regions=True)
    rng = np.random.RandomState(0)
    ims = jnp.asarray(rng.randint(0, 256, (2, 96, 128, 3)).astype(np.uint8))
    with mesh:
        boxes, scores, valid = sharded(net.params, ims)
    single = jax.jit(make_propose_batch(net.model, cfg, canvas))(net.params, ims)
    np.testing.assert_array_equal(np.asarray(valid), np.asarray(single[2]))
    np.testing.assert_allclose(np.asarray(scores), np.asarray(single[1]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(boxes), np.asarray(single[0]), atol=1e-3)


def test_latency_propose_matches_single_device():
    """Single-image path with the frontier sharded over ALL 8 devices."""
    from aznet_tpu.api import build_az_net, make_propose_batch
    from aznet_tpu.parallel.inference import make_latency_propose
    from aznet_tpu.config import cfg_from_dict

    cfg = _propose_cfg()
    net = build_az_net(cfg)
    mesh = make_mesh(8, model_parallel=2)
    canvas = (64, 128)
    lat = make_latency_propose(net.model, cfg, canvas, mesh)
    rng = np.random.RandomState(3)
    im = jnp.asarray(rng.randint(0, 256, (96, 128, 3)).astype(np.uint8))
    with mesh:
        boxes, scores, valid = lat(net.params, im)
    single = jax.jit(make_propose_batch(net.model, cfg, canvas))(
        net.params, im[None])
    np.testing.assert_array_equal(np.asarray(valid), np.asarray(single[2][0]))
    np.testing.assert_allclose(np.asarray(scores), np.asarray(single[1][0]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(boxes), np.asarray(single[0][0]), atol=1e-3)


def test_train_loop_with_mesh(tmp_path):
    from aznet_tpu.config import cfg_from_dict
    from aznet_tpu.data.synthetic import SyntheticImdb
    from aznet_tpu.train.loop import train_az_net

    cfg = cfg_from_dict(
        Config(),
        {
            "MODEL": {"BACKBONE": "smallnet", "FC_DIM": 32, "NUM_TEMPLATES": 5,
                      "NUM_CLASSES": 4, "COMPUTE_DTYPE": "float32"},
            "TRAIN": {"SCALES": [64], "MAX_SIZE": 96, "REGIONS_PER_IMAGE": 16,
                      "IMS_PER_BATCH": 8, "LEARNING_RATE": 0.003,
                      "GRAD_CLIP": 10.0, "USE_FLIPPED": False,
                      "SNAPSHOT_ITERS": 100},
            "TEST": {"SCALES": [64], "MAX_SIZE": 96},
        },
    )
    imdb = SyntheticImdb(split="val", seed=1, num_images=8, image_hw=(96, 128))
    mesh = make_mesh(8, model_parallel=2)
    state, model, outdir = train_az_net(
        cfg, "synthetic_val", max_iters=4, output_dir=str(tmp_path),
        imdb=imdb, mesh=mesh,
    )
    assert int(state.step) == 4
    leaves = jax.tree_util.tree_leaves(jax.device_get(state.params))
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)


def test_sharded_detect_matches_single_device():
    from aznet_tpu.api import build_frcnn_net, make_detect_batch
    from aznet_tpu.parallel.inference import make_sharded_detect
    from aznet_tpu.config import cfg_from_dict

    cfg = cfg_from_dict(
        Config(),
        {
            "MODEL": {"BACKBONE": "smallnet", "FC_DIM": 32, "NUM_TEMPLATES": 5,
                      "NUM_CLASSES": 4, "COMPUTE_DTYPE": "float32"},
            "TEST": {"SCALES": [64], "MAX_SIZE": 128},
        },
    )
    net = build_frcnn_net(cfg)
    mesh = make_mesh(8, model_parallel=1)
    canvas = (64, 128)
    rng = np.random.RandomState(1)
    ims = jnp.asarray(rng.randint(0, 256, (8, 96, 128, 3)).astype(np.uint8))
    boxes = jnp.asarray(rng.uniform(0, 60, (8, 4, 4)).astype(np.float32))
    boxes = boxes.at[..., 2:].add(30.0)
    sharded = make_sharded_detect(net.model, cfg, canvas, mesh)
    with mesh:
        s1, p1 = sharded(net.params, ims, boxes)
    s2, p2 = jax.jit(make_detect_batch(net.model, cfg, canvas))(net.params, ims, boxes)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), atol=1e-5)
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), atol=1e-3)


def test_multihost_input_pipeline_helpers():
    """Process-sharded sampling + global-batch assembly (SURVEY 2.4).

    At process_count == 1 (this test env) the helpers are identities /
    plain sharded puts — which is exactly the multi-host code path run with
    one process, so the CPU mesh exercises the real code.
    """
    import numpy as np
    from aznet_tpu.train.loop import (
        process_local_indices, local_batch_size, make_global_batch)

    assert process_local_indices(5) == [0, 1, 2, 3, 4]
    assert local_batch_size(8) == 8

    mesh = make_mesh(8, model_parallel=1)
    batch = {"images": np.zeros((8, 16, 16, 3), np.float32),
             "labels": np.arange(8, dtype=np.int32)}
    out = make_global_batch(batch, mesh)
    assert out["images"].shape == (8, 16, 16, 3)
    # batch dim sharded over 'data' (8-way): one row per device
    assert len(out["images"].addressable_shards) == 8
    assert out["images"].addressable_shards[0].data.shape == (1, 16, 16, 3)
    assert np.asarray(out["labels"]).tolist() == list(range(8))


def test_two_process_multihost_dryrun():
    """REAL multi-host branch: 2 jax.distributed CPU processes x 4 devices,
    per-process roidb shards, make_global_batch assembly, one sharded step
    (VERDICT r2 item 8). Subprocess-based; ~1-2 min."""
    from aznet_tpu.parallel.multihost import run_multihost_dryrun

    report = run_multihost_dryrun(num_processes=2, devices_per_proc=4,
                                  timeout=420)
    assert "processes=2" in report and "devices=8" in report
    assert report.endswith("OK")
