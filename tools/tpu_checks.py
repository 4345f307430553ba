#!/usr/bin/env python
"""Real-TPU kernel correctness checks -> one JSON artifact per round.

CI runs every Pallas kernel in interpret mode on CPU (tests/test_pallas.py);
a Mosaic compiler regression on real hardware would otherwise only surface
as silently wrong bench numbers. This tool runs the compiled kernels on the
actual chip and checks them against independent oracles:

  nms_pallas        vs the C++ greedy oracle (csrc/aznet_host.cc)
  bbox_overlaps     (Pallas tiled) vs broadcast jnp IoU
  roi_align_pallas  vs the XLA separable-matmul roi_align
  int8 GEMM conv    vs the f32 XLA conv (exact on integer grids)
  int8 strip kernel (the shipping Pallas Mosaic path) vs the f32 conv
  az_search         (device program, smallnet) vs the NumPy oracle

Usage:  python tools/tpu_checks.py [--out TPUCHECK.json]
Writes/prints {"device", "checks": {name: {"ok": bool, ...}}, "all_ok"}.
Exit code 0 iff everything passed (or --allow-cpu with no TPU).
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def check_nms():
    import jax
    import jax.numpy as jnp

    from aznet_tpu.ops.pallas.nms_kernel import nms_pallas
    from aznet_tpu.utils import native

    rng = np.random.RandomState(3)
    n = 2048
    xy = rng.uniform(0, 1500, (n, 2)).astype(np.float32)
    wh = rng.uniform(5, 250, (n, 2)).astype(np.float32)
    boxes = np.concatenate([xy, xy + wh], -1)
    scores = rng.rand(n).astype(np.float32)
    keep = np.asarray(jax.jit(lambda b, s: nms_pallas(b, s, 0.5))(
        jnp.asarray(boxes), jnp.asarray(scores)))
    kept_idx = sorted(np.flatnonzero(keep).tolist())
    if native.available():
        dets = np.concatenate([boxes, scores[:, None]], -1)
        ref = sorted(native.nms(dets, 0.5))
        src = "cpp_oracle"
    else:  # NumPy greedy fallback oracle
        from aznet_tpu.ops.nms import nms as nms_host

        ref = sorted(nms_host(np.concatenate([boxes, scores[:, None]], -1), 0.5))
        src = "numpy_oracle"
    return {"ok": kept_idx == list(ref), "kept": len(kept_idx),
            "oracle": src}


def check_nms_intkey():
    """order_mode='intkey' (the two-key integer sort the bench uses) must
    give the SAME keep set as the stable-argsort path on hardware, on
    tie-heavy scores including signed zeros — the round-3 advisor found
    the float-side -0.0 fold silently elided under jit; this pins the
    integer-side fix on the real compiler."""
    import jax
    import jax.numpy as jnp

    from aznet_tpu.ops.pallas.nms_kernel import nms_pallas_batched

    rng = np.random.RandomState(23)
    bsz, n = 4, 1024
    xy = rng.uniform(0, 1200, (bsz, n, 2)).astype(np.float32)
    wh = rng.uniform(5, 250, (bsz, n, 2)).astype(np.float32)
    boxes = jnp.asarray(np.concatenate([xy, xy + wh], -1))
    scores_np = np.floor(rng.rand(bsz, n) * 16).astype(np.float32) / 16.0
    scores_np[0, :32] = -0.0
    # Subnormals: the intkey builder flushes every exponent-zero value to
    # the +0.0 key, relying on XLA's sort comparator being FTZ so the
    # stable argsort also ties them with 0.0. That comparator behavior is
    # undocumented — pin it ON HARDWARE, not just CPU (round-4 advisor):
    # a backend whose comparator ranked subnormals IEEE-exactly would
    # break the identical-order contract for the default serving path.
    scores_np[1, :16] = 1e-40
    scores_np[1, 16:32] = -1e-40
    scores_np[1, 32:48] = 0.0
    scores = jnp.asarray(scores_np)
    run = jax.jit(lambda b, s, m: nms_pallas_batched(b, s, 0.5, order_mode=m),
                  static_argnums=2)
    got = np.asarray(run(boxes, scores, "intkey"))
    ref = np.asarray(run(boxes, scores, "argsort"))
    mismatch = int((got != ref).sum())
    return {"ok": mismatch == 0, "mismatch": mismatch,
            "kept": int(got.sum())}


def check_iou():
    import jax
    import jax.numpy as jnp

    from aznet_tpu.ops.iou import bbox_overlaps
    from aznet_tpu.ops.pallas.iou_kernel import bbox_overlaps_pallas

    rng = np.random.RandomState(5)
    a = rng.uniform(0, 500, (300, 4)).astype(np.float32)
    b = rng.uniform(0, 500, (200, 4)).astype(np.float32)
    a[:, 2:] += a[:, :2]
    b[:, 2:] += b[:, :2]
    got = np.asarray(jax.jit(bbox_overlaps_pallas)(jnp.asarray(a),
                                                   jnp.asarray(b)))
    ref = np.asarray(bbox_overlaps(jnp.asarray(a), jnp.asarray(b)))
    err = float(np.abs(got - ref).max())
    return {"ok": err < 1e-5, "max_err": err}


def check_roi_align():
    import jax
    import jax.numpy as jnp

    from aznet_tpu.ops.roi_pool import roi_align
    from aznet_tpu.ops.pallas.roi_kernel import roi_align_pallas

    rng = np.random.RandomState(7)
    feat = jnp.asarray(rng.randn(38, 50, 256).astype(np.float32))
    rois = np.zeros((64, 4), np.float32)
    rois[:, 0] = rng.uniform(0, 600, 64)
    rois[:, 1] = rng.uniform(0, 450, 64)
    rois[:, 2] = rois[:, 0] + rng.uniform(16, 200, 64)
    rois[:, 3] = rois[:, 1] + rng.uniform(16, 150, 64)
    rois = jnp.asarray(rois)
    got = np.asarray(jax.jit(
        lambda f, r: roi_align_pallas(f, r, 1.0 / 16.0))(feat, rois))
    ref = np.asarray(jax.jit(
        lambda f, r: roi_align(f, r, 1.0 / 16.0))(feat, rois))
    err = float(np.abs(got - ref).max() / max(np.abs(ref).max(), 1e-6))
    return {"ok": err < 1e-3, "max_rel_err": err}


def check_roi_align_big():
    """Tiled large-map roi align (roi_align_pallas_big) vs the XLA w-first
    separable align at the REAL config-5 search-head shape: 68x120x1024
    bf16 conv4 map, 128-roi frontier level. Multi-tile in every grid dim
    (8 c-tiles x 3 h-tiles with a padded tail x 4 roi-tiles); tolerance =
    bf16 compute dtype (both paths stage bf16 between contractions, in
    different reduction orders)."""
    import jax
    import jax.numpy as jnp

    from aznet_tpu.ops.roi_pool import roi_align
    from aznet_tpu.ops.pallas.roi_kernel import roi_align_pallas_big

    rng = np.random.RandomState(17)
    feat = jnp.asarray(rng.randn(68, 120, 1024).astype(np.float32),
                       jnp.bfloat16)
    n = 128
    rois = np.zeros((n, 4), np.float32)
    rois[:, 0] = rng.uniform(0, 1700, n)
    rois[:, 1] = rng.uniform(0, 900, n)
    rois[:, 2] = rois[:, 0] + rng.uniform(32, 1900 - rois[:, 0].max(), n)
    rois[:, 3] = rois[:, 1] + rng.uniform(32, 1080 - rois[:, 1].max(), n)
    rois = jnp.asarray(rois)
    got = np.asarray(jax.jit(
        lambda f, r: roi_align_pallas_big(f, r, 1.0 / 16.0))(feat, rois)
    ).astype(np.float32)
    ref = np.asarray(jax.jit(
        lambda f, r: roi_align(f, r, 1.0 / 16.0, w_first=True))(feat, rois)
    ).astype(np.float32)
    err = float(np.abs(got - ref).max() / max(np.abs(ref).max(), 1e-6))
    cos = float((got * ref).sum()
                / max(np.linalg.norm(got) * np.linalg.norm(ref), 1e-9))
    return {"ok": err < 2e-2 and cos > 0.9999, "max_rel_err": err,
            "cosine": cos}


def check_roi_align_int8():
    """int8-MXU roi align vs the f32 separable align on the same
    (dequantized) features: error bound = weight-quant + bf16-rows +
    final-round budget (tests/test_roi_int8.py, DESIGN round-4)."""
    import jax
    import jax.numpy as jnp

    from aznet_tpu.ops.roi_pool import roi_align, roi_align_int8

    rng = np.random.RandomState(7)
    feat8 = rng.randint(-127, 128, (38, 50, 512)).astype(np.int8)
    rois = np.zeros((256, 4), np.float32)
    rois[:, 0] = rng.uniform(0, 600, 256)
    rois[:, 1] = rng.uniform(0, 450, 256)
    rois[:, 2] = rois[:, 0] + rng.uniform(16, 200, 256)
    rois[:, 3] = rois[:, 1] + rng.uniform(16, 150, 256)
    rois = jnp.asarray(rois)
    got = np.asarray(jax.jit(
        lambda f, r: roi_align_int8(f, r, 1.0 / 16.0)
    )(jnp.asarray(feat8), rois)).astype(np.float32)
    ref = np.asarray(jax.jit(
        lambda f, r: roi_align(f, r, 1.0 / 16.0)
    )(jnp.asarray(feat8, jnp.float32), rois))
    err = float(np.abs(got - ref).max())
    cos = float((got * ref).sum()
                / max(np.linalg.norm(got) * np.linalg.norm(ref), 1e-9))
    return {"ok": err <= 3.5 and cos > 0.999, "max_err_int8_units": err,
            "cosine": cos}


def check_int8_conv():
    import jax.numpy as jnp
    import jax

    from aznet_tpu.ops.conv_int8 import conv3x3_f32_reference, conv3x3_int8

    rng = np.random.RandomState(11)
    x = rng.randint(-5, 6, (2, 32, 40, 64)).astype(np.float32)
    w = rng.randint(-3, 4, (3, 3, 64, 128)).astype(np.float32)
    b = rng.randint(-2, 3, (128,)).astype(np.float32)
    w_q = jnp.asarray(w.reshape(3, 3 * 64, 128), jnp.int8)
    s_w = jnp.ones((128,), jnp.float32)
    y = np.asarray(jax.jit(
        lambda xi, wq, bb: conv3x3_int8(xi, 1.0, wq, s_w, bb,
                                        out_dtype=jnp.float32))(
        jnp.asarray(x, jnp.int8), w_q, jnp.asarray(b)))
    ref = np.asarray(conv3x3_f32_reference(jnp.asarray(x), jnp.asarray(w),
                                           jnp.asarray(b)))
    err = float(np.abs(y - ref).max())
    return {"ok": err == 0.0, "max_err": err}


def check_int8_conv_pallas():
    """The SHIPPING int8 path: the Mosaic strip kernel, not the XLA dots.

    MODEL.INT8_BACKEND defaults to 'pallas'; a Mosaic lowering regression
    here would otherwise only surface as silently wrong bench/eval numbers
    (the CPU tests run the kernel in interpret mode only).
    """
    import jax
    import jax.numpy as jnp

    from aznet_tpu.ops.conv_int8 import conv3x3_f32_reference
    from aznet_tpu.ops.pallas.conv_int8_kernel import conv3x3_int8_pallas

    rng = np.random.RandomState(13)
    # C=128/K=256 exercises the real lane layout; H%T!=0 exercises the
    # tail strip; values on the integer grid make the check exact.
    x = rng.randint(-5, 6, (2, 37, 25, 128)).astype(np.float32)
    w = rng.randint(-3, 4, (3, 3, 128, 256)).astype(np.float32)
    b = rng.randint(-2, 3, (256,)).astype(np.float32)
    w9 = jnp.asarray(w.reshape(9, 128, 256), jnp.int8)
    sw = jnp.ones((256,), jnp.float32)
    y = np.asarray(jax.jit(
        lambda xi, wq, bb: conv3x3_int8_pallas(xi, 1.0, wq, sw, bb,
                                               out_dtype=jnp.float32))(
        jnp.asarray(x, jnp.int8), w9, jnp.asarray(b)))
    ref = np.asarray(conv3x3_f32_reference(jnp.asarray(x), jnp.asarray(w),
                                           jnp.asarray(b)))
    err = float(np.abs(y - ref).max())
    return {"ok": err == 0.0, "max_err": err}


def check_int8_chain():
    """Chain kernel (haloed layout + fused pool) == strip kernel + XLA
    int8 pool, bit-exactly, on hardware — the shipping MODEL.INT8_BACKEND
    'pallas' walk since round 3 (DESIGN.md finding 18)."""
    import flax.linen as nn
    import jax
    import jax.numpy as jnp

    from aznet_tpu.ops.pallas.conv_int8_kernel import conv3x3_int8_pallas
    from aznet_tpu.ops.pallas.conv_int8_chain import (conv3x3_int8_chain,
                                                      halo_layout)

    rng = np.random.RandomState(17)
    # two chained layers: interior (fused pool) then exit (compact bf16);
    # H%T != 0 exercises the tail strip + row masking of both kernels.
    x = rng.randint(-5, 6, (2, 38, 50, 128)).astype(np.int8)
    w1 = rng.randint(-3, 4, (3, 3, 128, 256)).astype(np.float32)
    b1 = rng.randint(-2, 3, (256,)).astype(np.float32)
    w2 = rng.randint(-3, 4, (3, 3, 256, 128)).astype(np.float32)
    b2 = rng.randint(-2, 3, (128,)).astype(np.float32)
    w19 = jnp.asarray(w1.reshape(9, 128, 256), jnp.int8)
    w29 = jnp.asarray(w2.reshape(9, 256, 128), jnp.int8)
    s1 = jnp.ones((256,), jnp.float32)
    s2 = jnp.ones((128,), jnp.float32)
    s_mid = 64.0  # power of two: requant exact in both formulations

    @jax.jit
    def chain(xi):
        y = conv3x3_int8_chain(halo_layout(xi), 1.0, w19, s1,
                               jnp.asarray(b1), 38, 50, s_out=s_mid,
                               pool=True)
        return conv3x3_int8_chain(y, s_mid, w29, s2, jnp.asarray(b2),
                                  19, 25, s_out=None,
                                  out_dtype=jnp.float32)[:, :19]

    @jax.jit
    def strip(xi):
        y = conv3x3_int8_pallas(xi, 1.0, w19, s1, jnp.asarray(b1),
                                s_out=s_mid)
        y = nn.max_pool(y, (2, 2), strides=(2, 2))
        return conv3x3_int8_pallas(y, s_mid, w29, s2, jnp.asarray(b2),
                                   out_dtype=jnp.float32)

    a = np.asarray(chain(jnp.asarray(x)))
    b = np.asarray(strip(jnp.asarray(x)))
    err = float(np.abs(a - b).max())
    return {"ok": err == 0.0, "max_err": err}


def check_int8_resnet():
    """Calibrated int8 ResNet-50 trunk (bottleneck 1x1 GEMMs,
    models/resnet.py) vs the bf16 trunk on hardware — the BASELINE
    config-5 int8 path. Int8 is lossy by design, so the bar is the same
    cosine/energy bound the CPU test uses
    (tests/test_int8_resnet.py::test_resnet_int8_trunk_matches_f32_features);
    a Mosaic/XLA int8-GEMM regression would blow straight through it."""
    import jax
    import jax.numpy as jnp

    from aznet_tpu.api import build_az_net
    from aznet_tpu.config import Config, cfg_from_dict
    from aznet_tpu.ops.quant import (calibrate_trunk_int8_resnet,
                                     with_int8_scales)

    cfg = cfg_from_dict(Config(), {
        "MODEL": {"BACKBONE": "resnet50", "FC_DIM": 64, "NUM_TEMPLATES": 5,
                  "DROPOUT": 0.0}})
    net = build_az_net(cfg)
    rng = np.random.RandomState(19)
    images = rng.uniform(-120, 120, (2, 128, 128, 3)).astype(np.float32)
    scales = calibrate_trunk_int8_resnet(net, images, batch_size=2)
    net8 = build_az_net(with_int8_scales(cfg, scales), params=net.params)
    feats = jax.jit(lambda p, x: net.model.apply(p, x, method="features"))
    feats8 = jax.jit(lambda p, x: net8.model.apply(p, x, method="features"))
    ref = np.asarray(feats(net.params, jnp.asarray(images)), np.float32)
    out = np.asarray(feats8(net8.params, jnp.asarray(images)), np.float32)
    cos = float((out * ref).sum()
                / max(np.linalg.norm(out) * np.linalg.norm(ref), 1e-9))
    rel = float(np.abs(out - ref).mean() / max(np.abs(ref).mean(), 1e-9))
    return {"ok": cos > 0.98 and rel < 0.2, "cosine": cos, "mean_rel": rel}


def check_search():
    import jax
    import jax.numpy as jnp

    from aznet_tpu.config import ModelConfig, SearchConfig
    from aznet_tpu.models import AZNet
    from aznet_tpu.search import az_search, az_search_oracle

    model = AZNet(model_cfg=ModelConfig(
        BACKBONE="smallnet", FC_DIM=32, NUM_TEMPLATES=5,
        COMPUTE_DTYPE="float32", POOLING_MODE="align"))
    scfg = SearchConfig(FRONTIER_CAP=32, CAND_BUF=256, MAX_LEVELS=3,
                        NUM_PROPOSALS=20, ZOOM_THRESH=0.2, MIN_SIZE=8.0,
                        CONF_THRESH=0.05, NMS_THRESH=0.7, SEED_LEVELS=1)
    rng = np.random.RandomState(3)
    h, w = 96, 128
    images = jnp.asarray(rng.uniform(-1, 1, (1, h, w, 3)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(3), images,
                        jnp.array([[0.0, 0.0, 63.0, 63.0]]))
    feat = model.apply(params, images, method="features")[0]

    def roi_fwd(f, r):
        return model.apply(params, f, r, method="roi_forward")

    boxes, scores, valid = jax.jit(
        lambda f: az_search(roi_fwd, f, (h, w), scfg, num_templates=5))(feat)
    nv = int(np.asarray(valid).sum())
    ob, osc = az_search_oracle(
        lambda f, r: roi_fwd(jnp.asarray(f), jnp.asarray(r)),
        np.asarray(feat), (h, w), scfg, num_templates=5)
    n_ok = nv == len(osc)
    s_err = float(np.abs(np.asarray(scores)[:nv] - osc).max()) if n_ok else 1e9
    b_err = float(np.abs(np.asarray(boxes)[:nv] - ob).max()) if n_ok else 1e9
    return {"ok": n_ok and s_err < 1e-2 and b_err < 0.5,
            "n_device": nv, "n_oracle": len(osc),
            "score_err": s_err, "box_err": b_err}


def check_nms_bitonic():
    """order_mode='bitonic' (the round-5 in-kernel bitonic ordering — the
    XLA sort + sorted gathers move inside the Pallas kernel) must give the
    SAME keep masks as the stable-argsort path on hardware, on the same
    tie-heavy stream set (signed zeros, subnormals, quantized ties) plus a
    non-power-of-two N that exercises the pad-to-power-of-two path."""
    import jax
    import jax.numpy as jnp

    from aznet_tpu.ops.pallas.nms_kernel import nms_pallas_batched

    rng = np.random.RandomState(29)
    out = {}
    for n in (1024, 3000):
        bsz = 4
        xy = rng.uniform(0, 1200, (bsz, n, 2)).astype(np.float32)
        wh = rng.uniform(5, 250, (bsz, n, 2)).astype(np.float32)
        boxes = jnp.asarray(np.concatenate([xy, xy + wh], -1))
        scores_np = np.floor(rng.rand(bsz, n) * 16).astype(np.float32) / 16.0
        scores_np[0, :32] = -0.0
        scores_np[1, :16] = 1e-40
        scores_np[1, 16:32] = -1e-40
        scores_np[1, 32:48] = 0.0
        scores = jnp.asarray(scores_np)
        run = jax.jit(
            lambda b, s, m, u: nms_pallas_batched(b, s, 0.5, order_mode=m,
                                                  unpermute=u),
            static_argnums=(2, 3))
        got = np.asarray(run(boxes, scores, "bitonic", "scatter"))
        ref = np.asarray(run(boxes, scores, "argsort", "scatter"))
        out[f"mismatch_n{n}"] = int((got != ref).sum())
        out[f"kept_n{n}"] = int(got.sum())
        # round-5b: the in-kernel (2-plane bitonic) unpermute too
        got_b = np.asarray(run(boxes, scores, "bitonic", "bitonic"))
        out[f"mismatch_bup_n{n}"] = int((got_b != ref).sum())
    out["ok"] = all(v == 0 for k, v in out.items() if k.startswith("mismatch"))
    return out


CHECKS = {
    "nms_pallas_vs_greedy_oracle": check_nms,
    "nms_intkey_vs_argsort_order": check_nms_intkey,
    "nms_bitonic_vs_argsort_order": check_nms_bitonic,
    "iou_pallas_vs_jnp": check_iou,
    "roi_align_pallas_vs_xla": check_roi_align,
    "roi_align_big_vs_xla_wfirst": check_roi_align_big,
    "roi_align_int8_vs_f32": check_roi_align_int8,
    "int8_conv_vs_f32_exact": check_int8_conv,
    "int8_conv_pallas_strip_vs_f32_exact": check_int8_conv_pallas,
    "int8_chain_vs_strip_exact": check_int8_chain,
    "int8_resnet_trunk_vs_bf16": check_int8_resnet,
    "az_search_device_vs_oracle": check_search,
}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default=None, help="write JSON here")
    p.add_argument("--allow-cpu", action="store_true",
                   help="run on CPU (interpret-mode kernels) without failing")
    p.add_argument("--only", default=None,
                   help="comma list of check names to run (iterate on one "
                        "kernel without paying the full compile sweep)")
    args = p.parse_args()

    import jax

    platform = jax.devices()[0].platform
    if platform == "cpu" and not args.allow_cpu:
        print("no TPU visible; pass --allow-cpu to run interpreted")
        sys.exit(2)

    out = {"device": str(jax.devices()[0]), "platform": platform,
           "timestamp": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
           "checks": {}}
    checks = CHECKS
    if args.only:
        keep = set(args.only.split(","))
        unknown = keep - set(CHECKS)
        if unknown:
            print(f"unknown checks: {sorted(unknown)}"); sys.exit(2)
        checks = {k: v for k, v in CHECKS.items() if k in keep}
    for name, fn in checks.items():
        t0 = time.perf_counter()
        try:
            res = fn()
        except Exception as e:  # a crash is a failed check, not a crash here
            res = {"ok": False, "error": f"{type(e).__name__}: {e}"}
        res["seconds"] = round(time.perf_counter() - t0, 2)
        out["checks"][name] = res
        print(f"[{'ok' if res['ok'] else 'FAIL'}] {name} "
              f"({res['seconds']}s) {res}", flush=True)
    out["all_ok"] = all(c["ok"] for c in out["checks"].values())
    js = json.dumps(out, indent=1)
    if args.out:
        with open(args.out, "w") as f:
            f.write(js + "\n")
    print(js)
    sys.exit(0 if out["all_ok"] else 1)


if __name__ == "__main__":
    main()
