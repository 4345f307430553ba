"""Training: losses, optimizer, train steps, checkpointing.

Reference equivalents (SURVEY.md §2.1/§2.2): ``lib/detect/train.py`` and
``lib/fast_rcnn/train.py`` — Caffe SGDSolver wrappers (momentum 0.9, weight
decay 5e-4, step LR) driven one iteration at a time from Python. Here a
train step is one compiled program (forward + backward + SGD update), run
data-parallel over the mesh.
"""

from aznet_tpu.train.train_az import (
    az_loss,
    make_az_train_state,
    make_az_train_step,
)
from aznet_tpu.train.train_frcnn import (
    frcnn_loss,
    make_frcnn_train_state,
    make_frcnn_train_step,
)
from aznet_tpu.train.optim import make_optimizer, lr_schedule
