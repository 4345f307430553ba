"""Train steps: loss sanity, overfitting a fixed batch, optimizer parity."""

import numpy as np
import jax
import jax.numpy as jnp

from aznet_tpu.config import Config, cfg_from_dict
from aznet_tpu.models import AZNet, FRCNN
from aznet_tpu.train import (
    az_loss,
    frcnn_loss,
    make_az_train_state,
    make_az_train_step,
    make_frcnn_train_state,
    make_frcnn_train_step,
    lr_schedule,
)

CFG = cfg_from_dict(
    Config(),
    {
        "MODEL": {"BACKBONE": "smallnet", "FC_DIM": 32, "NUM_TEMPLATES": 5,
                  "NUM_CLASSES": 4, "COMPUTE_DTYPE": "float32", "DROPOUT": 0.1},
        "TRAIN": {"LEARNING_RATE": 0.03, "STEPSIZE": 1000},
    },
)

B, R, K, C = 2, 8, 5, 4


def _az_batch(rng):
    return {
        "images": jnp.asarray(rng.uniform(-1, 1, (B, 64, 64, 3)).astype(np.float32)),
        "rois": jnp.asarray(rng.uniform(0, 40, (B, R, 4)).astype(np.float32))
        .at[..., 2:].add(16.0),
        "roi_valid": jnp.ones((B, R), bool),
        "zoom_labels": jnp.asarray(rng.randint(0, 2, (B, R)).astype(np.float32)),
        "adj_labels": jnp.asarray(rng.randint(0, 2, (B, R, K)).astype(np.float32)),
        "adj_targets": jnp.asarray(rng.normal(0, 0.1, (B, R, K, 4)).astype(np.float32)),
        "adj_inside": jnp.ones((B, R, K, 4), jnp.float32),
    }


def _frcnn_batch(rng):
    labels = rng.randint(0, C, (B, R))
    inside = np.zeros((B, R, 4 * C), np.float32)
    targets = np.zeros((B, R, 4 * C), np.float32)
    for b in range(B):
        for r in range(R):
            if labels[b, r] > 0:
                s = 4 * labels[b, r]
                inside[b, r, s : s + 4] = 1.0
                targets[b, r, s : s + 4] = rng.normal(0, 0.1, 4)
    return {
        "images": jnp.asarray(rng.uniform(-1, 1, (B, 64, 64, 3)).astype(np.float32)),
        "rois": jnp.asarray(rng.uniform(0, 40, (B, R, 4)).astype(np.float32))
        .at[..., 2:].add(16.0),
        "roi_valid": jnp.ones((B, R), bool),
        "labels": jnp.asarray(labels),
        "bbox_targets": jnp.asarray(targets),
        "bbox_inside": jnp.asarray(inside),
    }


def test_az_loss_finite_and_components():
    model = AZNet(model_cfg=CFG.MODEL)
    state = make_az_train_state(CFG, model, jax.random.PRNGKey(0))
    batch = _az_batch(np.random.RandomState(0))
    loss, metrics = az_loss(model, state.params, batch)
    assert np.isfinite(float(loss))
    assert float(metrics["zoom_loss"]) > 0
    assert float(metrics["adj_loss"]) > 0
    assert float(metrics["bbox_loss"]) >= 0


def test_az_overfit_fixed_batch():
    model = AZNet(model_cfg=CFG.MODEL)
    state = make_az_train_state(CFG, model, jax.random.PRNGKey(0))
    step = jax.jit(make_az_train_step(model))
    batch = _az_batch(np.random.RandomState(1))
    rng = jax.random.PRNGKey(42)
    loss0 = float(az_loss(model, state.params, batch)[0])
    for _ in range(60):
        state, metrics = step(state, batch, rng)
    loss1 = float(az_loss(model, state.params, batch)[0])
    assert loss1 < loss0 * 0.8, (loss0, loss1)
    assert float(metrics["grad_norm"]) > 0


def test_frcnn_overfit_fixed_batch():
    model = FRCNN(model_cfg=CFG.MODEL)
    state = make_frcnn_train_state(CFG, model, jax.random.PRNGKey(0))
    step = jax.jit(make_frcnn_train_step(model))
    batch = _frcnn_batch(np.random.RandomState(2))
    rng = jax.random.PRNGKey(42)
    loss0 = float(frcnn_loss(model, state.params, batch)[0])
    for _ in range(60):
        state, metrics = step(state, batch, rng)
    loss1 = float(frcnn_loss(model, state.params, batch)[0])
    assert loss1 < loss0 * 0.8, (loss0, loss1)
    assert float(metrics["acc"]) >= 0


def test_masked_rois_do_not_contribute():
    model = AZNet(model_cfg=CFG.MODEL)
    state = make_az_train_state(CFG, model, jax.random.PRNGKey(0))
    batch = _az_batch(np.random.RandomState(3))
    # Zero out half the rois via the mask; corrupting their labels must not
    # change the loss.
    valid = np.ones((B, R), bool)
    valid[:, R // 2 :] = False
    batch["roi_valid"] = jnp.asarray(valid)
    loss_a = float(az_loss(model, state.params, batch)[0])
    corrupted = dict(batch)
    corrupted["zoom_labels"] = batch["zoom_labels"].at[:, R // 2 :].set(1.0)
    corrupted["adj_labels"] = batch["adj_labels"].at[:, R // 2 :].set(1.0)
    corrupted["adj_targets"] = batch["adj_targets"].at[:, R // 2 :].add(5.0)
    loss_b = float(az_loss(model, state.params, corrupted)[0])
    assert abs(loss_a - loss_b) < 1e-5


def test_lr_schedule_step_decay():
    sched = lr_schedule(CFG.TRAIN)
    assert abs(float(sched(0)) - 0.03) < 1e-6
    assert abs(float(sched(1000)) - 0.003) < 1e-7
    assert abs(float(sched(2500)) - 0.0003) < 1e-8


def test_dropout_masks_differ_per_image():
    """Two identical images in a batch must get DIFFERENT dropout masks
    (round-1 bug: one rng shared across the vmapped head made them equal)."""
    model = AZNet(model_cfg=CFG.MODEL)
    state = make_az_train_state(CFG, model, jax.random.PRNGKey(0))
    batch = _az_batch(np.random.RandomState(5))
    # Make image 1 an exact copy of image 0 (and same rois/labels).
    for k in batch:
        batch[k] = batch[k].at[1].set(batch[k][0])

    feats = model.apply(state.params, batch["images"], method="features")
    img_rngs = jax.random.split(jax.random.PRNGKey(7), B)
    out = jax.vmap(
        lambda f, r, key: model.apply(state.params, f, r, method="roi_forward",
                                      train=True, rngs={"dropout": key})
    )(feats, batch["rois"], img_rngs)
    # Same inputs, different dropout rng => different head outputs.
    assert not np.allclose(np.asarray(out["zoom"][0]), np.asarray(out["zoom"][1]))
    # And the loss path itself uses per-image rngs (no exception, finite).
    loss, _ = az_loss(model, state.params, batch,
                      dropout_rng=jax.random.PRNGKey(3))
    assert np.isfinite(float(loss))


def test_frozen_prefixes_exactly_frozen_under_weight_decay():
    """FREEZE_PREFIXES must stop weight decay too, not just gradients —
    otherwise add_decayed_weights shrinks "frozen" params by ~lr*wd per
    step and an AZ-initialized FRCNN trunk drifts out of exact sharing."""
    import dataclasses

    import optax

    from aznet_tpu.train.optim import make_optimizer

    tcfg = dataclasses.replace(
        Config().TRAIN, FREEZE_PREFIXES=("trunk",), WEIGHT_DECAY=5e-4,
        LEARNING_RATE=0.1, GRAD_CLIP=10.0)
    params = {
        "params": {
            "trunk": {"conv": {"kernel": jnp.ones((3, 3)), "bias": jnp.ones(3)}},
            "head": {"kernel": jnp.ones((3, 3)), "bias": jnp.ones(3)},
        }
    }
    tx = make_optimizer(tcfg)
    opt_state = tx.init(params)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    p = params
    for _ in range(5):
        updates, opt_state = tx.update(grads, opt_state, p)
        p = optax.apply_updates(p, updates)
    trunk = p["params"]["trunk"]["conv"]
    np.testing.assert_array_equal(np.asarray(trunk["kernel"]), 1.0)
    np.testing.assert_array_equal(np.asarray(trunk["bias"]), 1.0)
    # unfrozen params did move
    assert not np.allclose(np.asarray(p["params"]["head"]["kernel"]), 1.0)


def test_az_remat_trunk_same_step():
    """TRAIN.REMAT_TRUNK changes memory scheduling, not math: one step with
    remat_trunk=True produces the same params/metrics as without."""
    model = AZNet(model_cfg=CFG.MODEL)
    state = make_az_train_state(CFG, model, jax.random.PRNGKey(0))
    batch = _az_batch(np.random.RandomState(3))
    rng = jax.random.PRNGKey(7)
    s_a, m_a = jax.jit(make_az_train_step(model))(state, batch, rng)
    s_b, m_b = jax.jit(make_az_train_step(model, remat_trunk=True))(
        state, batch, rng)
    np.testing.assert_allclose(float(m_a["loss"]), float(m_b["loss"]),
                               rtol=1e-6)
    flat_a = jax.tree_util.tree_leaves(s_a.params)
    flat_b = jax.tree_util.tree_leaves(s_b.params)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)
