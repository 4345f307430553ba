"""ROI heads: AZ (zoom + adjacency) and Fast-R-CNN (cls + bbox).

Reference equivalents (SURVEY.md §2.1): the prototxt head stacks —
ROIPool(7x7) -> fc6(4096)/ReLU/Dropout -> fc7(4096)/ReLU/Dropout -> heads.
AZ head: 1 zoom sigmoid, K adjacency sigmoids, 4K regression outputs.
FRCNN head: 21-way softmax ``cls_score`` + 84-d ``bbox_pred``.

Init mirrors the lineage: gaussian(0.01) for scores, gaussian(0.001) for
bbox regressors, zeros for biases. Heads return LOGITS; sigmoids/softmax are
applied by the callers (losses want logits, search wants probabilities).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import flax.linen as nn


class _FCStack(nn.Module):
    """fc6/fc7 with ReLU + dropout, shared by both heads.

    ``int8_scales = (s_in, s_mid)`` switches inference to int8 GEMMs
    (ops/conv_int8 quantization scheme): the pooled features quantize with
    the calibrated trunk-output scale, fc6's output with ``s_mid``. The
    25088x4096 fc6 kernel is the search's hot matmul AND is re-read from
    HBM at every tree level — int8 quarters both the weight traffic and
    the MXU time (272 TOPS vs 152 TFLOP/s bf16 on v5e). Same params.
    """

    fc_dim: int = 4096
    # fc7 width; 0 = fc_dim (VGG_CNN_M_1024 uses 4096/1024).
    fc7_dim: int = 0
    dropout: float = 0.5
    dtype: Any = jnp.bfloat16
    int8_scales: tuple = ()

    @nn.compact
    def __call__(self, x, train: bool = False):
        # x: [R, P, P, C] pooled roi features. int8 input = ALREADY
        # quantized at s_in (the int8 roi_align path) — valid only for the
        # int8 inference stack, which then skips its own quantize.
        x = x.reshape((x.shape[0], -1))
        if self.int8_scales and not train and not self.is_initializing():
            return self._int8_stack(x)
        if x.dtype == jnp.int8:
            raise ValueError("int8 pooled features reached a non-int8 head "
                             "(missing INT8_HEAD_SCALES, or train=True)")
        x = x.astype(self.dtype)
        x = nn.Dense(self.fc_dim, dtype=self.dtype, name="fc6")(x)
        x = nn.relu(x)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        x = nn.Dense(self.fc7_dim or self.fc_dim, dtype=self.dtype, name="fc7")(x)
        x = nn.relu(x)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return x

    def _int8_stack(self, x):
        from aznet_tpu.ops.conv_int8 import INT8_MAX, quantize_acts

        p = self.variables["params"]
        s_in, s_mid = self.int8_scales

        def int8_dense(x8, sx, name, s_out):
            w = p[name]["kernel"].astype(jnp.float32)
            sw = jnp.maximum(jnp.max(jnp.abs(w), axis=0) / INT8_MAX, 1e-12)
            wq = jnp.clip(jnp.round(w / sw), -INT8_MAX, INT8_MAX
                          ).astype(jnp.int8)
            acc = jax.lax.dot_general(
                x8, wq, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            y = acc.astype(jnp.float32) * (sx * sw) + p[name]["bias"]
            y = jnp.maximum(y, 0.0)
            if s_out is None:
                return y.astype(self.dtype)
            return quantize_acts(y, s_out)

        # roi_align_int8 hands pooled features over pre-quantized at s_in
        # (same scale by convexity) — skip the dequant->requant round trip.
        x8 = x if x.dtype == jnp.int8 else quantize_acts(
            x.astype(jnp.float32), s_in)
        h8 = int8_dense(x8, s_in, "fc6", s_mid)
        return int8_dense(h8, s_mid, "fc7", None)


def _fused_heads(params, x, names):
    """One f32 dot against the column-concatenated kernels of ``names``."""
    w = jnp.concatenate(
        [params[n]["kernel"].astype(jnp.float32) for n in names], axis=1)
    b = jnp.concatenate(
        [params[n]["bias"].astype(jnp.float32) for n in names])
    return jax.lax.dot_general(
        x.astype(jnp.float32), w,
        dimension_numbers=(((x.ndim - 1,), (0,)), ((), ()))) + b


class AZHead(nn.Module):
    """[R, P, P, C] roi features -> zoom/adjacency logits and deltas.

    Returns dict: ``zoom [R]``, ``adj_score [R, K]`` (logits),
    ``adj_delta [R, K, 4]`` (float32 regression outputs).
    """

    num_templates: int = 11
    fc_dim: int = 4096
    fc7_dim: int = 0
    dropout: float = 0.5
    dtype: Any = jnp.bfloat16
    int8_scales: tuple = ()

    @nn.compact
    def __call__(self, roi_feats, train: bool = False):
        k = self.num_templates
        x = _FCStack(self.fc_dim, self.fc7_dim, self.dropout, self.dtype,
                     self.int8_scales, name="fc")(roi_feats, train)
        if self.is_initializing() or train:
            zoom = nn.Dense(1, dtype=jnp.float32, name="zoom_score",
                            kernel_init=nn.initializers.normal(0.01))(x)
            adj = nn.Dense(k, dtype=jnp.float32, name="adj_score",
                           kernel_init=nn.initializers.normal(0.01))(x)
            delta = nn.Dense(4 * k, dtype=jnp.float32, name="adj_bbox",
                             kernel_init=nn.initializers.normal(0.001))(x)
        else:
            # Inference fast path: ONE [fc7, 1+5K] dot instead of three
            # separate tiny-N f32 dots — XLA does not merge sibling dots,
            # and these run EVERY search level inside the while_loop. The
            # concat of loop-invariant params is hoisted by XLA; per-column
            # math is identical to the separate Dense calls.
            y = _fused_heads(self.variables["params"], x,
                             ("zoom_score", "adj_score", "adj_bbox"))
            zoom = y[..., 0:1]
            adj = y[..., 1 : 1 + k]
            delta = y[..., 1 + k :]
        return {
            "zoom": zoom[..., 0].astype(jnp.float32),
            "adj_score": adj.astype(jnp.float32),
            "adj_delta": delta.reshape(delta.shape[:-1] + (k, 4)).astype(jnp.float32),
        }


class FRCNNHead(nn.Module):
    """[R, P, P, C] roi features -> ``cls_score [R, C]``, ``bbox_pred [R, 4C]``."""

    num_classes: int = 21
    fc_dim: int = 4096
    fc7_dim: int = 0
    dropout: float = 0.5
    dtype: Any = jnp.bfloat16
    int8_scales: tuple = ()

    @nn.compact
    def __call__(self, roi_feats, train: bool = False):
        x = _FCStack(self.fc_dim, self.fc7_dim, self.dropout, self.dtype,
                     self.int8_scales, name="fc")(roi_feats, train)
        if self.is_initializing() or train:
            cls = nn.Dense(self.num_classes, dtype=jnp.float32, name="cls_score",
                           kernel_init=nn.initializers.normal(0.01))(x)
            bbox = nn.Dense(4 * self.num_classes, dtype=jnp.float32, name="bbox_pred",
                            kernel_init=nn.initializers.normal(0.001))(x)
        else:
            y = _fused_heads(self.variables["params"], x,
                             ("cls_score", "bbox_pred"))
            cls = y[..., : self.num_classes]
            bbox = y[..., self.num_classes :]
        return {"cls_score": cls.astype(jnp.float32), "bbox_pred": bbox.astype(jnp.float32)}
