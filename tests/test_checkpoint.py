"""Checkpointing: orbax save/restore + bbox normalization baking."""

import numpy as np
import jax
import jax.numpy as jnp

from aznet_tpu.config import Config, cfg_from_dict
from aznet_tpu.models import AZNet
from aznet_tpu.train import make_az_train_state
from aznet_tpu.utils.checkpoint import (
    Checkpointer,
    bake_bbox_normalization,
    unbake_bbox_normalization,
)

CFG = cfg_from_dict(
    Config(),
    {"MODEL": {"BACKBONE": "smallnet", "FC_DIM": 16, "NUM_TEMPLATES": 3,
               "COMPUTE_DTYPE": "float32"}},
)

MEANS = (0.0, 0.0, 0.0, 0.0)
STDS = (0.1, 0.1, 0.2, 0.2)


def test_bake_unbake_roundtrip():
    model = AZNet(model_cfg=CFG.MODEL)
    state = make_az_train_state(CFG, model, jax.random.PRNGKey(0))
    baked = bake_bbox_normalization(state.params, MEANS, STDS)
    restored = unbake_bbox_normalization(baked, MEANS, STDS)
    for a, b in zip(jax.tree_util.tree_leaves(state.params),
                    jax.tree_util.tree_leaves(restored)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_bake_semantics():
    # Baked head output == std * raw + mean for every input.
    model = AZNet(model_cfg=CFG.MODEL)
    state = make_az_train_state(CFG, model, jax.random.PRNGKey(0))
    baked = bake_bbox_normalization(state.params, (0.1, 0.2, 0.3, 0.4), STDS)
    images = jnp.ones((1, 64, 64, 3))
    rois = jnp.array([[0.0, 0.0, 31.0, 31.0]])
    raw = model.apply(state.params, images, rois)["adj_delta"]
    out = model.apply(baked, images, rois)["adj_delta"]
    means = np.array([0.1, 0.2, 0.3, 0.4], np.float32)
    stds = np.array(STDS, np.float32)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(raw) * stds + means, atol=1e-5
    )


def test_checkpoint_save_restore(tmp_path):
    model = AZNet(model_cfg=CFG.MODEL)
    state = make_az_train_state(CFG, model, jax.random.PRNGKey(0))
    ck = Checkpointer(str(tmp_path / "ckpts"))
    ck.save(7, {"params": state.params, "step": 7})
    assert ck.latest_step() == 7
    template = {"params": state.params, "step": 0}
    restored, step = ck.restore(template)
    assert step == 7
    for a, b in zip(jax.tree_util.tree_leaves(state.params),
                    jax.tree_util.tree_leaves(restored["params"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
