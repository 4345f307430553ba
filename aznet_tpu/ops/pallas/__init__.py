"""Pallas TPU kernels for the hot ops.

Reference equivalents (SURVEY.md §2.3): the Cython NMS and CUDA ROIPooling —
the reference's "native layer". On TPU the native layer is Pallas: kernels
here fuse work into VMEM-resident tiles instead of host loops/CUDA blocks.
All kernels have interpret-mode fallbacks so the CPU test suite validates
them against the pure-JAX/host oracles.
"""

from aznet_tpu.ops.pallas.nms_kernel import nms_pallas
from aznet_tpu.ops.pallas.iou_kernel import bbox_overlaps_pallas
