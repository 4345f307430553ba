"""Profiling/tracing helpers.

Reference equivalent (SURVEY.md §5.1): ``lib/utils/timer.py`` prints and the
``caffe time`` binary. Here: ``jax.profiler`` traces viewable in
TensorBoard/XProf, plus a block timer that actually synchronizes the async
backend before reading the clock.
"""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a device trace: ``with trace('/tmp/tb'): step()``."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def block_timer(name: str, tree=None):
    """Wall-time a block, synchronizing ``tree`` (or all devices) at exit."""
    t0 = time.perf_counter()
    out = {}
    try:
        yield out
    finally:
        if tree is not None:
            jax.block_until_ready(tree)
        out["seconds"] = time.perf_counter() - t0
        print(f"[timer] {name}: {out['seconds'] * 1000:.2f} ms", flush=True)


def device_memory_stats() -> dict:
    """Per-device memory stats where the backend exposes them."""
    stats = {}
    for d in jax.devices():
        try:
            stats[str(d)] = d.memory_stats()
        except Exception:  # pragma: no cover - backend-dependent
            stats[str(d)] = None
    return stats
