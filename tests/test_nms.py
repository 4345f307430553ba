"""NMS: host-oracle golden tests + device/oracle equivalence + properties."""

import numpy as np
import jax
import jax.numpy as jnp

from aznet_tpu.ops import nms, nms_jax, nms_mask
from aznet_tpu.ops.nms import nms_topk


def _random_dets(rng, n, span=100.0):
    xy = rng.uniform(0, span, (n, 2))
    wh = rng.uniform(5, span / 2, (n, 2))
    scores = rng.permutation(n).astype(np.float32) / n  # distinct scores
    return np.concatenate([xy, xy + wh, scores[:, None]], axis=1).astype(np.float32)


def test_host_nms_golden():
    dets = np.array(
        [
            [0, 0, 9, 9, 0.9],
            [1, 1, 10, 10, 0.8],  # IoU with box0 ~ 64/136 > 0.3 -> suppressed
            [50, 50, 59, 59, 0.7],
        ],
        dtype=np.float32,
    )
    assert nms(dets, 0.3) == [0, 2]
    # Higher threshold keeps all.
    assert nms(dets, 0.8) == [0, 1, 2]


def test_host_nms_empty():
    assert nms(np.zeros((0, 5), np.float32), 0.3) == []


def test_device_matches_host_oracle():
    rng = np.random.RandomState(3)
    f = jax.jit(nms_jax)  # thresh traced: one compile per shape
    for n in (1, 7, 128):
        dets = _random_dets(rng, n)
        for t in (0.3, 0.5, 0.7):
            want = np.zeros(n, bool)
            want[nms(dets, t)] = True
            got = np.asarray(f(jnp.asarray(dets), t))
            np.testing.assert_array_equal(got, want, err_msg=f"n={n} t={t}")


_NMS_JIT = jax.jit(nms_jax)


def test_device_nms_chain_suppression():
    # A -> suppresses B; B would have suppressed C; C must survive.
    dets = np.array(
        [
            [0, 0, 10, 10, 0.9],
            [5, 0, 15, 10, 0.8],  # overlaps A heavily
            [10, 0, 20, 10, 0.7],  # overlaps B heavily, A slightly
        ],
        dtype=np.float32,
    )
    t = 0.3
    want = np.zeros(3, bool)
    want[nms(dets, t)] = True
    got = np.asarray(_NMS_JIT(jnp.asarray(dets), t))
    np.testing.assert_array_equal(got, want)
    assert want[2]  # the chain case actually exercised


def test_device_nms_with_padding():
    rng = np.random.RandomState(7)
    dets = _random_dets(rng, 30)
    valid = np.ones(40, bool)
    valid[30:] = False
    padded = np.zeros((40, 5), np.float32)
    padded[:30] = dets
    got = np.asarray(nms_jax(jnp.asarray(padded), 0.4, valid=jnp.asarray(valid)))
    want = np.zeros(40, bool)
    want[nms(dets, 0.4)] = True
    np.testing.assert_array_equal(got, want)


def test_nms_idempotent():
    rng = np.random.RandomState(11)
    dets = _random_dets(rng, 64)
    keep1 = np.asarray(_NMS_JIT(jnp.asarray(dets), 0.5))
    kept = dets[keep1]
    keep2 = nms(kept, 0.5)
    # Survivors are mutually non-overlapping: a second NMS keeps everything
    # (returned in score order, hence sorted comparison).
    assert sorted(keep2) == list(range(len(kept)))


def test_nms_topk():
    rng = np.random.RandomState(5)
    dets = _random_dets(rng, 64)
    boxes, scores, valid = jax.jit(lambda b, s: nms_topk(b, s, 0.5, 10))(
        jnp.asarray(dets[:, :4]), jnp.asarray(dets[:, 4])
    )
    keep = nms(dets, 0.5)[:10]
    nk = min(len(keep), 10)
    assert int(valid.sum()) == nk
    np.testing.assert_allclose(np.asarray(boxes)[:nk], dets[keep[:nk], :4], atol=1e-5)
    # scores sorted desc
    s = np.asarray(scores)[:nk]
    assert np.all(np.diff(s) <= 0)


def test_nms_vmap():
    rng = np.random.RandomState(13)
    batch = np.stack([_random_dets(rng, 32) for _ in range(4)])
    got = np.asarray(jax.vmap(lambda d: nms_jax(d, 0.5))(jnp.asarray(batch)))
    for i in range(4):
        want = np.zeros(32, bool)
        want[nms(batch[i], 0.5)] = True
        np.testing.assert_array_equal(got[i], want)
