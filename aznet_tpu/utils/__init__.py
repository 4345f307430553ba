"""Utilities: timing, structured logging, checkpointing."""

from aznet_tpu.utils.timer import Timer
from aznet_tpu.utils.logging import MetricLogger
