#!/usr/bin/env python
"""Generate and cache proposals for an imdb (feeds FRCNN training).

Reference equivalent: the propose mode of the test tool chained by
``experiments/scripts`` between AZ training and FRCNN training
(SURVEY.md §2.5).
"""

import argparse
import pickle
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser(description="Cache AZ-Net proposals for an imdb")
    p.add_argument("--imdb", default="synthetic_train")
    p.add_argument("--cfg", default=None)
    p.add_argument("--set", dest="set_cfgs", nargs="*", default=[])
    p.add_argument("--ckpt", default=None)
    p.add_argument("--out", default="output/proposals.pkl")
    p.add_argument("--max-images", type=int, default=None)
    p.add_argument("--batched", action="store_true",
                   help="batched on-device propose (canvas-bucketed; faster)")
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from aznet_tpu.config import Config, cfg_from_file, cfg_from_list
    from aznet_tpu.api import build_az_net
    from aznet_tpu.data.imdb import get_imdb
    from aznet_tpu.eval.detection import propose_all, propose_all_batched
    from aznet_tpu.utils.checkpoint import Checkpointer

    cfg = Config()
    if args.cfg:
        cfg = cfg_from_file(cfg, args.cfg)
    if args.set_cfgs:
        cfg = cfg_from_list(cfg, args.set_cfgs)
    net = build_az_net(cfg)
    if args.ckpt:
        path = args.ckpt
        deploy = os.path.join(args.ckpt, "deploy")
        if os.path.isdir(deploy):  # baked bbox normalization (deploy copy)
            path = deploy
        restored, step = Checkpointer(path).restore({"params": net.params})
        net.params = restored["params"]
        print(f"restored step {step} from {path}")
    imdb = get_imdb(args.imdb)
    if args.batched:
        props = propose_all_batched(net, imdb, batch_size=args.batch_size,
                                    max_images=args.max_images, verbose=True)
    else:
        props = propose_all(net, imdb, max_images=args.max_images, verbose=True)
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "wb") as f:
        pickle.dump(props, f)
    print(f"wrote {len(props)} proposal arrays to {args.out}")


if __name__ == "__main__":
    main()
