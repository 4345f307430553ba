"""VGG-16 convolutional trunk (conv1_1 .. conv5_3), stride 16.

Reference equivalent: the VGG-16 prototxt trunk (models/VGG16/*, SURVEY.md
§2.1) — 13 3x3 convs + ReLU with 4 max-pools; the 5th pool is NOT applied
(fast-rcnn uses conv5_3 at stride 16 for ROI pooling). Layer names mirror
the prototxt (conv1_1, ...) so converted Caffe weights map 1:1.

TPU notes: NHWC layout, bfloat16 compute / float32 params by default; the
convs are the MXU workload — XLA fuses the ReLUs.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import flax.linen as nn

# (name, channels) per conv; 'pool' entries are 2x2/2 max pools.
VGG16_LAYOUT = (
    ("conv1_1", 64), ("conv1_2", 64), ("pool1", None),
    ("conv2_1", 128), ("conv2_2", 128), ("pool2", None),
    ("conv3_1", 256), ("conv3_2", 256), ("conv3_3", 256), ("pool3", None),
    ("conv4_1", 512), ("conv4_2", 512), ("conv4_3", 512), ("pool4", None),
    ("conv5_1", 512), ("conv5_2", 512), ("conv5_3", 512),
)


class VGG16Trunk(nn.Module):
    """Input [..., H, W, 3] (preprocessed BGR) -> [..., H/16, W/16, 512*width]."""

    dtype: Any = jnp.bfloat16
    # Channel-width multiplier: 1.0 = the reference VGG-16; smaller keeps
    # the structure (layer names, sharding rules) at reduced cost.
    width: float = 1.0
    # The reference training freezes conv1/conv2 when fine-tuning from
    # ImageNet (fast-rcnn lineage lr_mult=0). Opt in via
    # cfg.TRAIN.FREEZE_PREFIXES=("conv1", "conv2") — see train/optim.py.

    # Inference-only: run conv1_1+ReLU+conv1_2+ReLU+pool1 as one fused
    # Pallas kernel (ops/pallas/conv1_kernel.py) — the block's 62 MB/image
    # activations otherwise make it the trunk's HBM-traffic hot spot.
    # Identical parameters/checkpoints; differentiating through it raises
    # (no VJP), so training keeps the XLA convolutions.
    fuse_conv1: bool = False

    feat_stride: int = 16

    @property
    def out_channels(self) -> int:
        return max(int(512 * self.width), 8)

    @nn.compact
    def __call__(self, x):
        x = x.astype(self.dtype)
        layout = VGG16_LAYOUT
        if (self.fuse_conv1 and not self.is_initializing()
                and x.shape[-3] % 32 == 0 and x.shape[-2] % 2 == 0
                and jax.default_backend() == "tpu"):
            from aznet_tpu.ops.pallas.conv1_kernel import fused_conv1_pool

            p = self.variables["params"]
            squeeze = x.ndim == 3
            xb = x[None] if squeeze else x
            xb = fused_conv1_pool(
                xb, p["conv1_1"]["kernel"], p["conv1_1"]["bias"],
                p["conv1_2"]["kernel"], p["conv1_2"]["bias"])
            x = xb[0] if squeeze else xb
            layout = VGG16_LAYOUT[3:]  # conv1_1, conv1_2, pool1 done
        for name, ch in layout:
            if ch is None:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            else:
                ch = max(int(ch * self.width), 8)
                x = nn.Conv(ch, (3, 3), padding="SAME", name=name, dtype=self.dtype)(x)
                x = nn.relu(x)
        return x
