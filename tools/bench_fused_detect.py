#!/usr/bin/env python
"""A/B evidence for the shared-trunk fused detection program.

Reference parity note: the reference runs propose and detect as two
separate Caffe nets, recomputing the conv trunk twice per image
(SURVEY.md §2.1 "Shared-trunk / combined eval"; mount empty, no
file:line exists). ``detect_all_fused`` runs trunk -> AZ search ->
FRCNN head as ONE jit program. This tool measures both paths on the
same ``share_trunk``'d parameters — identical math, so mAP must match
exactly; the speedup is the removed trunk + one less program dispatch.

Usage:
  python tools/bench_fused_detect.py --imdb synthetic_hard_test \
      --cfg experiments/cfgs/az_vgg_w50_synthetic_hard.yml \
      --ckpt output/quality_r2_w50/az --frcnn-ckpt output/quality_r2_w50/frcnn
Prints one JSON line {"fused_img_per_sec", "unfused_img_per_sec",
"speedup", "map_fused", "map_unfused", "identical"}.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--imdb", default="synthetic_hard_test")
    p.add_argument("--cfg", default=None)
    p.add_argument("--ckpt", required=True)
    p.add_argument("--frcnn-ckpt", required=True)
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--max-images", type=int, default=None)
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from aznet_tpu.api import build_az_net, build_frcnn_net, share_trunk
    from aznet_tpu.config import Config, cfg_from_file
    from aznet_tpu.data.imdb import get_imdb
    from aznet_tpu.eval.detection import detect_all_batched
    from aznet_tpu.eval.voc_eval import eval_detections_on_roidb
    from tools.test_net import _load_net

    cfg = Config()
    if args.cfg:
        cfg = cfg_from_file(cfg, args.cfg)
    imdb = get_imdb(args.imdb)
    az_net = _load_net(build_az_net, cfg, args.ckpt)
    frcnn_net = _load_net(build_frcnn_net, cfg, args.frcnn_ckpt)
    # If the FRCNN was trained with --init-trunk-from (frozen AZ trunk),
    # share_trunk is a numerical no-op and the reported mAPs are the real
    # detection quality. Otherwise the trunks differ, share_trunk changes
    # the FRCNN's features, and ONLY the fused-vs-unfused parity/speedup
    # fields are meaningful (absolute mAP is that of a mismatched head).
    import numpy as np

    import jax

    trunks_equal = all(
        np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(
            jax.tree_util.tree_leaves(az_net.params["params"]["trunk"]),
            jax.tree_util.tree_leaves(frcnn_net.params["params"]["trunk"])))
    share_trunk(frcnn_net, az_net)

    n = min(imdb.num_images, args.max_images or imdb.num_images)
    results = {}
    boxes = {}
    for fused in (True, False):  # fused first: warms the image cache for both
        name = "fused" if fused else "unfused"
        # warm compile (first bucket) then measure a full pass
        detect_all_batched(az_net, frcnn_net, imdb, fused=fused,
                           batch_size=args.batch_size,
                           max_images=min(args.batch_size, n))
        t0 = time.perf_counter()
        all_boxes = detect_all_batched(az_net, frcnn_net, imdb, fused=fused,
                                       batch_size=args.batch_size,
                                       max_images=n)
        dt = time.perf_counter() - t0
        results[f"{name}_img_per_sec"] = round(n / dt, 2)
        boxes[name] = all_boxes
        aps = eval_detections_on_roidb(
            [c[:n] for c in all_boxes], imdb.roidb[:n], imdb.num_classes)
        results[f"map_{name}"] = round(float(aps["mAP"]), 4)

    same = all(
        a.shape == b.shape and np.allclose(a, b, atol=1e-3)
        for ca, cb in zip(boxes["fused"], boxes["unfused"])
        for a, b in zip(ca, cb))
    results["speedup"] = round(
        results["fused_img_per_sec"] / results["unfused_img_per_sec"], 3)
    results["identical"] = bool(same)
    results["trunks_value_equal"] = bool(trunks_equal)
    if not trunks_equal:
        results["map_note"] = ("trunks differ; mAP is for the share_trunk'd "
                               "mismatched head — use an --init-trunk-from "
                               "FRCNN checkpoint for real mAP")
    print(json.dumps(results))


if __name__ == "__main__":
    main()
