#!/usr/bin/env python
"""Evaluate proposals (recall) or full detection (mAP) on an imdb.

Reference equivalent: ``tools/test_net.py`` (SURVEY.md §2.5, §3.4/3.5).

Examples:
  python tools/test_net.py --mode recall --imdb synthetic_test --ckpt output/...
  python tools/test_net.py --mode detect --imdb voc_2007_test \
      --ckpt az_ckpt_dir --frcnn-ckpt frcnn_ckpt_dir
"""

import argparse
import json
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args():
    p = argparse.ArgumentParser(description="Evaluate an aznet_tpu network")
    p.add_argument("--mode", choices=("recall", "detect"), default="recall")
    p.add_argument("--imdb", default="synthetic_test")
    p.add_argument("--cfg", default=None)
    p.add_argument("--set", dest="set_cfgs", nargs="*", default=[])
    p.add_argument("--ckpt", default=None, help="AZ checkpoint dir (orbax)")
    p.add_argument("--frcnn-ckpt", default=None, help="FRCNN checkpoint dir")
    p.add_argument("--max-images", type=int, default=None)
    p.add_argument("--batched", action="store_true",
                   help="batched on-device propose/detect (canvas-bucketed; faster)")
    p.add_argument("--batch-size", type=int, default=16,
                   help="images per device batch in --batched mode")
    p.add_argument("--int8", action="store_true",
                   help="calibrate + run the int8 GEMM trunk (vgg16 only)")
    p.add_argument("--calib-images", type=int, default=8,
                   help="imdb images used for int8 activation calibration")
    p.add_argument("--refine", action="store_true",
                   help="recall mode: second decode pass — re-regress each "
                        "proposal through the FRCNN bbox head (--frcnn-ckpt) "
                        "before the recall table (high-IoU recall lever)")
    p.add_argument("--share-trunk", action="store_true",
                   help="detect mode: copy the AZ trunk into the FRCNN net "
                        "(api.share_trunk); with --batched, detect auto-"
                        "dispatches to the fused single-program path; pair "
                        "with an FRCNN "
                        "checkpoint trained via train_net --init-trunk-from "
                        "or the reported mAP is that of a mismatched head")
    p.add_argument("--output", default="output/eval")
    p.add_argument("--cpu", action="store_true")
    return p.parse_args()


def _load_net(builder, cfg, ckpt_dir, prefer_deploy=True):
    net = builder(cfg)
    if ckpt_dir:
        import os

        from aznet_tpu.utils.checkpoint import Checkpointer

        # Prefer the deployment copy (bbox normalization baked into the
        # regression head — required for decoding raw head outputs).
        path = ckpt_dir
        deploy = os.path.join(ckpt_dir, "deploy")
        if prefer_deploy and os.path.isdir(deploy):
            path = deploy
        ck = Checkpointer(path)
        restored, step = ck.restore({"params": net.params})
        net.params = restored["params"]
        print(f"restored step {step} from {path}")
    return net


def main():
    args = parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    from aznet_tpu.config import Config, cfg_from_file, cfg_from_list
    from aznet_tpu.api import build_az_net, build_frcnn_net
    from aznet_tpu.data.imdb import get_imdb

    cfg = Config()
    if args.cfg:
        cfg = cfg_from_file(cfg, args.cfg)
    if args.set_cfgs:
        cfg = cfg_from_list(cfg, args.set_cfgs)

    imdb = get_imdb(args.imdb)
    az_net = _load_net(build_az_net, cfg, args.ckpt)
    if args.int8:
        from aznet_tpu.ops.quant import calibrate_net_on_imdb

        az_net = calibrate_net_on_imdb(az_net, imdb,
                                       n_images=args.calib_images)
        print(f"int8 trunk calibrated on {args.calib_images} images")

    if args.mode == "recall":
        from aznet_tpu.eval.detection import evaluate_recall

        refine_net = None
        if args.refine:
            if not args.frcnn_ckpt:
                raise SystemExit("--refine needs --frcnn-ckpt (the bbox "
                                 "head doing the second decode pass)")
            refine_net = _load_net(build_frcnn_net, cfg, args.frcnn_ckpt)
        table = evaluate_recall(az_net, imdb, max_images=args.max_images,
                                batched=args.batched,
                                batch_size=args.batch_size,
                                refine_net=refine_net)
        print(json.dumps({str(k): {str(t): round(v, 4) for t, v in row.items()}
                          for k, row in table.items()}, indent=2))
    else:
        from aznet_tpu.eval.detection import detect_all, detect_all_batched

        frcnn_net = _load_net(build_frcnn_net, cfg, args.frcnn_ckpt)
        if args.share_trunk:
            from aznet_tpu.api import share_trunk

            share_trunk(frcnn_net, az_net)
            print("trunk shared: fused single-program detect path enabled")
        cache = os.path.join(args.output, "detections.pkl")
        if args.batched:
            all_boxes = detect_all_batched(az_net, frcnn_net, imdb,
                                           batch_size=args.batch_size,
                                           max_images=args.max_images,
                                           cache_file=cache)
        else:
            all_boxes = detect_all(az_net, frcnn_net, imdb,
                                   max_images=args.max_images,
                                   cache_file=cache)
        n = args.max_images or imdb.num_images
        # Prefer the imdb's own protocol (VOC<=2009 selects the 11-point
        # metric, writes results files — the reference flow); fall back to
        # the generic roidb matcher for partial runs or imdbs without one.
        aps = None
        if n == imdb.num_images:
            try:
                aps = imdb.evaluate_detections(all_boxes, args.output)
            except NotImplementedError:
                aps = None
        sub = [cls_dets[:n] for cls_dets in all_boxes]
        roidb = imdb.roidb[:n]
        from aznet_tpu.eval.voc_eval import eval_detections_on_roidb

        if aps is None:
            aps = eval_detections_on_roidb(sub, roidb, imdb.num_classes)
        # Localization quality beyond the VOC .5 protocol (round-4 high-IoU
        # reporting): the same matcher at IoU .7.
        aps70 = eval_detections_on_roidb(sub, roidb, imdb.num_classes,
                                         ovthresh=0.7)
        aps = dict(aps)
        aps.update({f"{k}@0.7": v for k, v in aps70.items()})
        print(json.dumps({k: round(float(v), 4) for k, v in aps.items()}, indent=2))


if __name__ == "__main__":
    main()
