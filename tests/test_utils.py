"""Utility smoke tests: timer, profiling, metric logger."""

import json
import time

import jax.numpy as jnp

from aznet_tpu.utils.timer import Timer
from aznet_tpu.utils.profiling import block_timer, device_memory_stats
from aznet_tpu.utils.logging import MetricLogger


def test_timer_average():
    t = Timer()
    for _ in range(3):
        t.tic()
        time.sleep(0.01)
        dt = t.toc(average=False)
        assert dt >= 0.009
    assert t.calls == 3
    assert t.average_time >= 0.009


def test_block_timer_syncs():
    x = jnp.ones((128, 128))
    with block_timer("matmul", tree=x) as out:
        y = x @ x
    assert out["seconds"] >= 0


def test_device_memory_stats_shape():
    stats = device_memory_stats()
    assert len(stats) >= 1


def test_metric_logger_jsonl(tmp_path):
    logger = MetricLogger(str(tmp_path), "t")
    logger.log(5, {"loss": 1.25, "acc": jnp.float32(0.5)})
    lines = (tmp_path / "t_metrics.jsonl").read_text().strip().split("\n")
    rec = json.loads(lines[0])
    assert rec["step"] == 5 and rec["loss"] == 1.25 and rec["acc"] == 0.5
