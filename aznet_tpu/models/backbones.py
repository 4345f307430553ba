"""Backbone factory keyed on cfg.MODEL.BACKBONE."""

from __future__ import annotations

import jax.numpy as jnp

from aznet_tpu.config import ModelConfig
from aznet_tpu.models.vgg import VGG16Trunk
from aznet_tpu.models.resnet import ResNet50Trunk
from aznet_tpu.models.small import SmallTrunk, CaffeNetTrunk, VGGCNNM1024Trunk

_BACKBONES = {
    "vgg16": VGG16Trunk,
    "resnet50": ResNet50Trunk,
    "smallnet": SmallTrunk,
    # The reference fork's smaller prototxts (SURVEY.md §2.1 [M]). Pair
    # caffenet/vgg_cnn_m_1024 with MODEL.POOL_SIZE 6; the latter also with
    # MODEL.FC7_DIM 1024.
    "caffenet": CaffeNetTrunk,
    "vgg_cnn_m_1024": VGGCNNM1024Trunk,
}


def get_backbone(model_cfg: ModelConfig):
    """Instantiate the trunk module for a MODEL config."""
    try:
        cls = _BACKBONES[model_cfg.BACKBONE]
    except KeyError:
        raise ValueError(
            f"unknown backbone {model_cfg.BACKBONE!r}; options: {sorted(_BACKBONES)}"
        ) from None
    # int8 mode: trunk GEMMs are int8; conv1_1/heads compute in bfloat16.
    dtype = (jnp.float32 if model_cfg.COMPUTE_DTYPE == "float32"
             else jnp.bfloat16)
    if cls is VGG16Trunk:
        return cls(dtype=dtype, width=model_cfg.WIDTH,
                   fuse_conv1=model_cfg.FUSE_CONV1,
                   int8_mode=model_cfg.COMPUTE_DTYPE == "int8",
                   int8_scales=tuple(model_cfg.INT8_SCALES),
                   int8_backend=model_cfg.INT8_BACKEND,
                   int8_chain_from=model_cfg.INT8_CHAIN_FROM,
                   conv1_s2d=model_cfg.CONV1_S2D)
    if cls is ResNet50Trunk:
        # Int8 bottleneck 1x1 GEMMs (models/resnet.py docstring); the
        # stem/3x3s stay bf16. Scales from calibrate_trunk_int8_resnet.
        return cls(dtype=dtype,
                   int8_mode=model_cfg.COMPUTE_DTYPE == "int8",
                   int8_scales=tuple(model_cfg.INT8_SCALES),
                   stem_s2d=model_cfg.STEM_S2D)
    if model_cfg.COMPUTE_DTYPE == "int8":
        raise ValueError(
            f"COMPUTE_DTYPE='int8' is only implemented for the vgg16 and "
            f"resnet50 backbones, not {model_cfg.BACKBONE!r}")
    return cls(dtype=dtype)
