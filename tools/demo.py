#!/usr/bin/env python
"""Single-image end-to-end demo: AZ proposals -> Fast R-CNN -> NMS -> boxes.

Reference equivalent: ``tools/demo.py`` (SURVEY.md §2.5) — the smoke-test
path (BASELINE config 1). With no --image, runs on a synthetic
planted-boxes image so it works on any machine. Writes an annotated PNG
(PIL) next to --out.
"""

import argparse
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser(description="aznet_tpu demo")
    p.add_argument("--image", default=None, help="path to an image (BGR read)")
    p.add_argument("--cfg", default=None)
    p.add_argument("--set", dest="set_cfgs", nargs="*", default=[])
    p.add_argument("--ckpt", default=None)
    p.add_argument("--frcnn-ckpt", default=None)
    p.add_argument("--out", default="output/demo.png")
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from aznet_tpu.config import Config, cfg_from_file, cfg_from_list
    from aznet_tpu.api import build_az_net, build_frcnn_net, im_propose, im_detect
    from aznet_tpu.ops.nms import nms
    from aznet_tpu.utils.checkpoint import Checkpointer
    from aznet_tpu.utils.timer import Timer

    cfg = Config()
    if args.cfg:
        cfg = cfg_from_file(cfg, args.cfg)
    if args.set_cfgs:
        cfg = cfg_from_list(cfg, args.set_cfgs)

    if args.image:
        from aznet_tpu.data.imdb import _imread_bgr

        im = _imread_bgr(args.image)
        classes = None
    else:
        from aznet_tpu.data.synthetic import make_image, CLASSES

        im, gt, gtc = make_image(np.random.RandomState(0), 384, 512)
        classes = CLASSES
        print(f"synthetic image with {gt.shape[0]} planted boxes")

    def _restore(net, ckpt_dir):
        path = ckpt_dir
        deploy = os.path.join(ckpt_dir, "deploy")
        if os.path.isdir(deploy):  # baked bbox normalization (deploy copy)
            path = deploy
        net.params = Checkpointer(path).restore({"params": net.params})[0]["params"]

    az = build_az_net(cfg)
    if args.ckpt:
        _restore(az, args.ckpt)
    frcnn = build_frcnn_net(cfg)
    if args.frcnn_ckpt:
        _restore(frcnn, args.frcnn_ckpt)

    t = Timer()
    t.tic()
    dets = im_propose(az, im)
    print(f"im_propose: {dets.shape[0]} proposals in {t.toc(False):.3f}s")
    t.tic()
    scores, boxes = im_detect(frcnn, im, dets[:, :4])
    print(f"im_detect: {scores.shape} in {t.toc(False):.3f}s")

    results = []
    for c in range(1, cfg.MODEL.NUM_CLASSES):
        keep = scores[:, c] > cfg.TEST.SCORE_THRESH
        cls_dets = np.concatenate(
            [boxes[keep, 4 * c : 4 * c + 4], scores[keep, c : c + 1]], 1
        ).astype(np.float32)
        if cls_dets.shape[0]:
            cls_dets = cls_dets[nms(cls_dets, cfg.TEST.NMS)]
        for d in cls_dets[:5]:
            results.append((c, d))
    results.sort(key=lambda r: -r[1][4])
    for c, d in results[:10]:
        name = classes[c] if classes and c < len(classes) else f"cls{c}"
        print(f"  {name}: score={d[4]:.3f} box=({d[0]:.0f},{d[1]:.0f},{d[2]:.0f},{d[3]:.0f})")

    try:
        from PIL import Image, ImageDraw

        vis = Image.fromarray(im[:, :, ::-1])  # BGR -> RGB
        draw = ImageDraw.Draw(vis)
        for d in dets[:20]:
            draw.rectangle([d[0], d[1], d[2], d[3]], outline=(255, 255, 0))
        for c, d in results[:10]:
            draw.rectangle([d[0], d[1], d[2], d[3]], outline=(255, 0, 0), width=2)
        os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
        vis.save(args.out)
        print(f"wrote {args.out}")
    except ImportError:
        print("PIL unavailable; skipped visualization")


if __name__ == "__main__":
    main()
