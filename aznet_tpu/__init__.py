"""aznet_tpu — a TPU-native adjacency-and-zoom proposal + detection framework.

Brand-new JAX/XLA/Flax/Pallas implementation of the capabilities of the
reference ``luyongxi/az-net`` (AZ-Net, CVPR 2016; see SURVEY.md). Not a port:
the reference's host-driven recursive region search becomes an on-device
``lax.while_loop`` over padded frontiers; its Cython NMS / CUDA ROIPooling
become vectorized-JAX + Pallas kernels; its Caffe prototxt nets become Flax
modules; training is data-parallel ``pjit`` over a TPU mesh.

Public API mirrors the reference (SURVEY.md §3):
  - ``aznet_tpu.api.im_propose`` — scored proposal generation (reference
    ``lib/detect/test.py::im_propose``).
  - ``aznet_tpu.api.im_detect``  — Fast-R-CNN-style detection head forward
    (reference ``lib/fast_rcnn/test.py::im_detect``).
"""

__version__ = "0.1.0"
