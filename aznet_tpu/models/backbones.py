"""Backbone factory keyed on cfg.MODEL.BACKBONE."""

from __future__ import annotations

import jax.numpy as jnp

from aznet_tpu.config import ModelConfig
from aznet_tpu.models.vgg import VGG16Trunk
from aznet_tpu.models.resnet import ResNet50Trunk
from aznet_tpu.models.small import SmallTrunk

_BACKBONES = {
    "vgg16": VGG16Trunk,
    "resnet50": ResNet50Trunk,
    "smallnet": SmallTrunk,
}


def get_backbone(model_cfg: ModelConfig):
    """Instantiate the trunk module for a MODEL config."""
    try:
        cls = _BACKBONES[model_cfg.BACKBONE]
    except KeyError:
        raise ValueError(
            f"unknown backbone {model_cfg.BACKBONE!r}; options: {sorted(_BACKBONES)}"
        ) from None
    dtype = jnp.bfloat16 if model_cfg.COMPUTE_DTYPE == "bfloat16" else jnp.float32
    if cls is VGG16Trunk:
        return cls(dtype=dtype, width=model_cfg.WIDTH,
                   fuse_conv1=model_cfg.FUSE_CONV1)
    return cls(dtype=dtype)
