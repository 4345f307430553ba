"""Small convolutional trunk (CaffeNet/VGG_CNN_M-class stand-in).

The reference fork ships smaller prototxts (CaffeNet, VGG_CNN_M_1024 —
SURVEY.md §2.1 [M]) for fast experiments; this plays that role for tests,
demos and CI: 5 convs, stride 16, cheap enough to run on CPU.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
import flax.linen as nn


class SmallTrunk(nn.Module):
    """Input [..., H, W, 3] -> [..., H/16, W/16, out_channels]."""

    dtype: Any = jnp.bfloat16
    width: int = 64

    feat_stride: int = 16
    out_channels: int = 128

    @nn.compact
    def __call__(self, x):
        x = x.astype(self.dtype)
        w = self.width
        x = nn.Conv(w, (5, 5), strides=(2, 2), padding="SAME", dtype=self.dtype, name="conv1")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = nn.Conv(w * 2, (3, 3), strides=(2, 2), padding="SAME", dtype=self.dtype, name="conv2")(x)
        x = nn.relu(x)
        x = nn.Conv(w * 2, (3, 3), padding="SAME", dtype=self.dtype, name="conv3")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = nn.Conv(self.out_channels, (3, 3), padding="SAME", dtype=self.dtype, name="conv4")(x)
        x = nn.relu(x)
        return x
