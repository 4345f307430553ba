"""Loss golden tests (Caffe SmoothL1 / sigmoid-CE / softmax-CE semantics)."""

import numpy as np
import jax
import jax.numpy as jnp

from aznet_tpu.ops import smooth_l1_loss, sigmoid_ce_loss, softmax_ce_loss


def test_smooth_l1_golden():
    pred = jnp.array([0.0, 0.5, 2.0, -3.0])
    target = jnp.zeros(4)
    # per-elem: 0, 0.5*0.25=0.125, 2-0.5=1.5, 3-0.5=2.5 -> sum 4.125
    assert float(smooth_l1_loss(pred, target)) == 4.125


def test_smooth_l1_sigma():
    # sigma=2: quadratic zone |d| < 1/4; d=0.2 -> 0.5*4*0.04 = 0.08
    assert abs(float(smooth_l1_loss(jnp.array([0.2]), jnp.zeros(1), sigma=2.0)) - 0.08) < 1e-6
    # d=0.5 -> 0.5 - 0.125 = 0.375
    assert abs(float(smooth_l1_loss(jnp.array([0.5]), jnp.zeros(1), sigma=2.0)) - 0.375) < 1e-6


def test_smooth_l1_inside_weights_mask():
    pred = jnp.array([10.0, 0.5])
    target = jnp.zeros(2)
    iw = jnp.array([0.0, 1.0])
    assert float(smooth_l1_loss(pred, target, inside_weights=iw)) == 0.125


def test_smooth_l1_grad_continuous():
    g = jax.grad(lambda x: smooth_l1_loss(x, jnp.zeros(1)))
    eps = 1e-4
    glo = float(g(jnp.array([1.0 - eps]))[0])
    ghi = float(g(jnp.array([1.0 + eps]))[0])
    assert abs(glo - ghi) < 1e-3
    assert abs(ghi - 1.0) < 1e-3


def test_sigmoid_ce_golden():
    logits = jnp.array([0.0])
    labels = jnp.array([1.0])
    assert abs(float(sigmoid_ce_loss(logits, labels)) - np.log(2.0)) < 1e-6
    # large positive logit, label 1 -> ~0
    assert float(sigmoid_ce_loss(jnp.array([20.0]), jnp.array([1.0]))) < 1e-6
    # stability at extreme negative
    v = float(sigmoid_ce_loss(jnp.array([-100.0]), jnp.array([1.0])))
    assert np.isfinite(v) and abs(v - 100.0) < 1e-3


def test_softmax_ce_golden():
    logits = jnp.array([[0.0, 0.0, 0.0]])
    labels = jnp.array([1])
    assert abs(float(softmax_ce_loss(logits, labels)) - np.log(3.0)) < 1e-3


def test_weighted_means():
    logits = jnp.array([[10.0, 0.0], [0.0, 10.0]])
    labels = jnp.array([0, 0])
    w = jnp.array([1.0, 0.0])
    assert float(softmax_ce_loss(logits, labels, weights=w)) < 1e-3
