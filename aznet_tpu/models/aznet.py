"""AZ-Net model: trunk + ROI pooling + adjacency/zoom head.

Reference equivalent: the AZ train/test prototxts (models/VGG16/az/*,
SURVEY.md §2.1) wired through pycaffe. Key structural difference from the
reference: the trunk runs ONCE per image and the head is a pure function of
(features, rois) — so the on-device search loop (aznet_tpu.search) can call
``roi_forward`` inside ``lax.while_loop`` with zero host round-trips, where
the reference re-enters Caffe from Python at every tree level (SURVEY.md
§3.1).
"""

from __future__ import annotations

import flax.linen as nn

from aznet_tpu.config import ModelConfig
from aznet_tpu.models.backbones import get_backbone
from aznet_tpu.models.heads import AZHead
from aznet_tpu.ops.roi_pool import roi_pool


class AZNet(nn.Module):
    """Zoom/adjacency proposal network.

    Methods (use with ``model.apply(..., method=...)``):
      - ``features(images [B,H,W,3])`` -> ``[B, H/16, W/16, C]``
      - ``roi_forward(feat [h,w,C], rois [R,4])`` -> head outputs dict
      - ``__call__`` = features + roi_forward on image 0 (init convenience)
    """

    model_cfg: ModelConfig = ModelConfig()

    def setup(self):
        self.trunk = get_backbone(self.model_cfg)
        mc = self.model_cfg
        self.head = AZHead(
            num_templates=mc.NUM_TEMPLATES,
            fc_dim=mc.FC_DIM,
            fc7_dim=mc.FC7_DIM,
            dropout=mc.DROPOUT,
            dtype=self.trunk.dtype,
            # Heads quantize independently of the trunk: INT8_HEAD_SCALES
            # alone enables the int8 fc stack (bf16 trunk + int8 heads is
            # a valid, separately-benchable configuration).
            int8_scales=(tuple(mc.INT8_HEAD_SCALES)
                         if mc.COMPUTE_DTYPE != "float32" else ()),
        )

    def features(self, images):
        return self.trunk(images)

    def roi_pool_only(self, feat, rois):
        """Pool rois from one feature map (no head) — see FRCNN's note on
        the multi-scale pyramid's pool-select-then-head pattern."""
        return roi_pool(
            feat,
            rois,
            1.0 / self.model_cfg.FEAT_STRIDE,
            self.model_cfg.POOL_SIZE,
            mode=self.model_cfg.POOLING_MODE,
        )

    def head_forward(self, pooled, train: bool = False):
        return self.head(pooled, train=train)

    def roi_forward(self, feat, rois, train: bool = False):
        """feat: single-image [h, w, C]; rois: [R, 4] image coords."""
        return self.head(self.roi_pool_only(feat, rois), train=train)

    def __call__(self, images, rois, train: bool = False):
        feat = self.features(images)
        return self.roi_forward(feat[0], rois, train=train)
