"""Driver contract: __graft_entry__.entry traces; dryrun_multichip executes.

These guard the two functions the round driver calls (compile-check and
multi-chip validation) against interface drift.
"""

import os
import sys

import jax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __graft_entry__  # noqa: E402


def test_entry_traces():
    fn, args = __graft_entry__.entry()
    params, images = args
    assert images.shape == (1, 224, 224, 3)
    # Trace (no compile — full VGG-16 CPU compile is minutes) and check the
    # advertised output structure.
    shapes = jax.eval_shape(fn, params, images)
    boxes, scores, valid = shapes
    assert boxes.shape == (1, 300, 4)
    assert scores.shape == (1, 300)
    assert valid.shape == (1, 300)


def test_dryrun_multichip_small():
    # 2-device mesh keeps this affordable in the suite; the driver runs 8.
    __graft_entry__.dryrun_multichip(2)
