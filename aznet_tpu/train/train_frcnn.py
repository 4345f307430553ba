"""Fast R-CNN training step.

Reference equivalent: ``lib/fast_rcnn/train.py`` (SURVEY.md §2.2) — softmax
CE over 21 classes + SmoothL1 on class-indexed bbox targets with inside
weights (the 84-d expanded layout of ``_get_bbox_regression_labels``).

Batch layout (built by aznet_tpu.data.minibatch.get_frcnn_minibatch):
  images        [B, H, W, 3]
  rois          [B, R, 4]     scaled-image coords (sampled fg/bg)
  roi_valid     [B, R]
  labels        [B, R]        int class (0 = background)
  bbox_targets  [B, R, 4C]    class-indexed normalized targets
  bbox_inside   [B, R, 4C]    inside weights (1 on the fg class's 4 slots)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from aznet_tpu.config import Config
from aznet_tpu.ops.losses import softmax_ce_loss, smooth_l1_loss
from aznet_tpu.train.optim import make_optimizer
from aznet_tpu.train.train_az import TrainState


def frcnn_loss(model, params, batch, dropout_rng=None):
    train = dropout_rng is not None
    feats = model.apply(params, batch["images"], method="features")

    if train:
        # Per-image dropout rngs (see az_loss): one split per batch element.
        img_rngs = jax.random.split(dropout_rng, batch["images"].shape[0])

        def head_one(feat, rois, rng_i):
            return model.apply(params, feat, rois, method="roi_forward",
                               train=True, rngs={"dropout": rng_i})

        out = jax.vmap(head_one)(feats, batch["rois"], img_rngs)
    else:
        def head_one(feat, rois):
            return model.apply(params, feat, rois, method="roi_forward",
                               train=False)

        out = jax.vmap(head_one)(feats, batch["rois"])
    valid = batch["roi_valid"].astype(jnp.float32)

    cls_loss = softmax_ce_loss(out["cls_score"], batch["labels"], weights=valid)
    n_rois = jnp.maximum(jnp.sum(valid), 1.0)
    bbox_loss = (
        smooth_l1_loss(out["bbox_pred"], batch["bbox_targets"],
                       inside_weights=batch["bbox_inside"],
                       outside_weights=valid[..., None])
        / n_rois
    )
    loss = cls_loss + bbox_loss
    acc = jnp.sum((jnp.argmax(out["cls_score"], -1) == batch["labels"]) * valid) / n_rois
    return loss, {"loss": loss, "cls_loss": cls_loss, "bbox_loss": bbox_loss, "acc": acc}


def make_frcnn_train_state(cfg: Config, model, rng, image_hw=(64, 64)) -> TrainState:
    images = jnp.zeros((1,) + tuple(image_hw) + (3,), jnp.float32)
    rois = jnp.array([[0.0, 0.0, 31.0, 31.0]])
    params = model.init(rng, images, rois)
    tx = make_optimizer(cfg.TRAIN)
    return TrainState.create(apply_fn=model.apply, params=params, tx=tx)


def make_frcnn_train_step(model):
    def step(state: TrainState, batch, rng):
        dropout_rng = jax.random.fold_in(rng, state.step)
        grad_fn = jax.value_and_grad(
            lambda p: frcnn_loss(model, p, batch, dropout_rng), has_aux=True
        )
        (loss, metrics), grads = grad_fn(state.params)
        new_state = state.apply_gradients(grads=grads)
        metrics["grad_norm"] = optax.global_norm(grads)
        return new_state, metrics

    return step
