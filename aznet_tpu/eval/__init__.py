"""Evaluation: proposal recall curves and VOC-style detection AP.

Reference equivalents (SURVEY.md §2.2/§3.4): the recall@K evaluation in the
imdb layer and the VOCdevkit AP protocol (MATLAB in the reference; pure
Python here, following the standard 11-point / all-point definitions).
"""

from aznet_tpu.eval.recall import proposal_recall, recall_table
from aznet_tpu.eval.voc_eval import voc_ap, voc_eval, eval_detections_on_roidb
from aznet_tpu.eval.coco_eval import coco_eval
