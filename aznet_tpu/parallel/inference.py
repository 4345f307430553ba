"""Sharded batched inference over the device mesh.

No reference equivalent (the reference is single-GPU, SURVEY.md §2.4); this
is the "5,000 img/s on v5e-8" path: the batch dimension shards over the
'data' axis, parameters replicate, and XLA runs the whole propose pipeline
SPMD with zero collectives in the forward (embarrassingly parallel over
images — the ideal ICI story is the one where you don't use it).
"""

from __future__ import annotations

import jax

from aznet_tpu.api import make_propose_batch, make_detect_batch
from aznet_tpu.parallel.mesh import batch_sharding, replicate


def make_sharded_propose(model, cfg, canvas_hw, mesh):
    """jitted ``(params, images [B, H, W, 3]) -> (boxes, scores, valid)``
    with B sharded over mesh axis 'data'. B must divide by the data size."""
    fn = make_propose_batch(model, cfg, canvas_hw)
    out_shard = batch_sharding(mesh, 1)
    return jax.jit(
        fn,
        in_shardings=(replicate(mesh), batch_sharding(mesh, 4)),
        out_shardings=(out_shard, out_shard, out_shard),
    )


def make_sharded_detect(model, cfg, canvas_hw, mesh):
    """jitted sharded ``(params, images, boxes [B, R, 4]) -> (scores, preds)``."""
    fn = make_detect_batch(model, cfg, canvas_hw)
    out_shard = batch_sharding(mesh, 1)
    return jax.jit(
        fn,
        in_shardings=(replicate(mesh), batch_sharding(mesh, 4),
                      batch_sharding(mesh, 3)),
        out_shardings=(out_shard, out_shard),
    )
