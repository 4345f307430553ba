"""Datasets and host input pipeline.

Reference equivalents (SURVEY.md §2.2): ``lib/datasets/`` (imdb base class,
pascal_voc, factory) and ``lib/roi_data_layer/`` (minibatch sampling). Plus
a synthetic planted-boxes dataset the reference lacks — it makes end-to-end
training/recall tests possible on a machine with no VOC data (this one).
"""

from aznet_tpu.data.imdb import Imdb, get_imdb, list_imdbs
from aznet_tpu.data.synthetic import SyntheticImdb
