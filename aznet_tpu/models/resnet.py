"""ResNet-50 trunk (backbone-swap config, BASELINE config 5).

The reference has no ResNet (2016 Caffe-era VGG), but BASELINE.json's
config 5 calls for a ResNet-50 backbone swap. Output is the conv4_x (C4)
stage at stride 16, the classic Faster-R-CNN-style choice so ROI heads see
the same 1/16 feature scale as VGG.

BatchNorm is "frozen" (per-channel scale/bias parameters, no batch stats) —
standard practice for detection fine-tuning and far simpler under pjit (no
cross-device stat sync). Compute in bfloat16 on the MXU.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
import flax.linen as nn


class FrozenBN(nn.Module):
    """Per-channel affine (the inference form of BatchNorm)."""

    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        ch = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (ch,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (ch,), jnp.float32)
        return x * scale.astype(self.dtype) + bias.astype(self.dtype)


class Bottleneck(nn.Module):
    channels: int
    stride: int = 1
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        residual = x
        y = nn.Conv(self.channels, (1, 1), dtype=self.dtype, use_bias=False, name="conv1")(x)
        y = nn.relu(FrozenBN(dtype=self.dtype, name="bn1")(y))
        y = nn.Conv(self.channels, (3, 3), strides=(self.stride, self.stride),
                    padding="SAME", dtype=self.dtype, use_bias=False, name="conv2")(y)
        y = nn.relu(FrozenBN(dtype=self.dtype, name="bn2")(y))
        y = nn.Conv(self.channels * 4, (1, 1), dtype=self.dtype, use_bias=False, name="conv3")(y)
        y = FrozenBN(dtype=self.dtype, name="bn3")(y)
        if residual.shape[-1] != self.channels * 4 or self.stride != 1:
            residual = nn.Conv(self.channels * 4, (1, 1), strides=(self.stride, self.stride),
                               dtype=self.dtype, use_bias=False, name="downsample")(x)
            residual = FrozenBN(dtype=self.dtype, name="downsample_bn")(residual)
        return nn.relu(y + residual)


class ResNet50Trunk(nn.Module):
    """Input [..., H, W, 3] -> C4 features [..., H/16, W/16, 1024]."""

    dtype: Any = jnp.bfloat16
    stage_sizes: Sequence[int] = (3, 4, 6)  # C2, C3, C4 (C5 unused at 1/16)

    feat_stride: int = 16
    out_channels: int = 1024

    @nn.compact
    def __call__(self, x):
        x = x.astype(self.dtype)
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
                    dtype=self.dtype, use_bias=False, name="conv1")(x)
        x = nn.relu(FrozenBN(dtype=self.dtype, name="bn1")(x))
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
        for stage, num_blocks in enumerate(self.stage_sizes):
            channels = 64 * (2 ** stage)
            for block in range(num_blocks):
                stride = 2 if (stage > 0 and block == 0) else 1
                x = Bottleneck(channels, stride=stride, dtype=self.dtype,
                               name=f"layer{stage + 1}_block{block}")(x)
        return x
