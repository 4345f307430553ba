#!/usr/bin/env python
"""Train AZ-Net or Fast R-CNN on an imdb.

Reference equivalent: ``tools/train_net.py`` (SURVEY.md §2.5) — argparse
over solver/imdb/weights/iters. Here the "solver" is the frozen config tree
(YAML + KEY VALUE overrides).

Examples:
  python tools/train_net.py --net az --imdb synthetic_train --iters 500
  python tools/train_net.py --net frcnn --imdb voc_2007_trainval \
      --cfg experiments/cfgs/frcnn_vgg16.yml --proposals output/props.pkl
"""

import argparse
import pickle
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args():
    p = argparse.ArgumentParser(description="Train an aznet_tpu network")
    p.add_argument("--net", choices=("az", "frcnn"), default="az")
    p.add_argument("--imdb", default="synthetic_train")
    p.add_argument("--cfg", default=None, help="YAML config override file")
    p.add_argument("--set", dest="set_cfgs", nargs="*", default=[],
                   help="KEY VALUE config override pairs")
    p.add_argument("--iters", type=int, default=None)
    p.add_argument("--output", default=None, help="output/checkpoint dir")
    p.add_argument("--proposals", default=None,
                   help="frcnn: pickle of per-image proposal arrays")
    p.add_argument("--resume", default=None, help="checkpoint dir to resume from")
    p.add_argument("--init-trunk-from", default=None, metavar="CKPT",
                   help="checkpoint dir whose trunk params initialize this "
                        "net's trunk; unless --trunk-trainable, the trunk is "
                        "auto-added to TRAIN.FREEZE_PREFIXES so it stays "
                        "byte-identical and share_trunk/the fused detect "
                        "program apply. Enables the faster-rcnn-style "
                        "alternating scheme: (1) train az; (2) train frcnn "
                        "--init-trunk-from AZ --trunk-trainable (joint "
                        "finetune, warm start); (3) retrain az "
                        "--init-trunk-from FRCNN (frozen) -> both nets share "
                        "the detector's trunk exactly, each head trained "
                        "for it")
    p.add_argument("--trunk-trainable", action="store_true",
                   help="with --init-trunk-from: warm-start the trunk but "
                        "keep it trainable (no freeze)")
    p.add_argument("--init-trunk-type", choices=("az", "frcnn"), default=None,
                   help="net type of the --init-trunk-from checkpoint "
                        "(default: the opposite of --net)")
    p.add_argument("--cpu", action="store_true", help="force CPU backend")
    p.add_argument("--mesh", default=None,
                   help="data[xmodel] device mesh, e.g. '8' or '4x2'")
    p.add_argument("--debug-nans", action="store_true",
                   help="enable jax_debug_nans (SURVEY §5.2 sanitizer role)")
    return p.parse_args()


def main():
    args = parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    from aznet_tpu.config import Config, cfg_from_file, cfg_from_list, cfg_to_dict

    cfg = Config()
    if args.cfg:
        cfg = cfg_from_file(cfg, args.cfg)
    if args.set_cfgs:
        cfg = cfg_from_list(cfg, args.set_cfgs)

    import jax

    if args.debug_nans:
        jax.config.update("jax_debug_nans", True)
    print(f"devices: {jax.devices()}")
    print(f"imdb: {args.imdb}  net: {args.net}")

    from aznet_tpu.train.loop import train_az_net, train_frcnn_net

    mesh = None
    if args.mesh:
        from aznet_tpu.parallel import make_mesh

        parts = [int(v) for v in args.mesh.split("x")]
        data = parts[0]
        model_par = parts[1] if len(parts) > 1 else 1
        mesh = make_mesh(data * model_par, model_parallel=model_par)
        print(f"mesh: {dict(mesh.shape)}")

    def trunk_init_state(cfg):
        """(cfg', state) warm-started from --init-trunk-from (or (cfg, None)).

        The donor checkpoint may be of either net type (identical 'trunk'
        subtree); unless --trunk-trainable the trunk is frozen exactly
        (gradients AND weight decay) so it stays byte-identical.
        """
        if not args.init_trunk_from:
            return cfg, None
        import dataclasses

        from aznet_tpu.api import build_az_net, build_frcnn_net
        from aznet_tpu.models import AZNet, FRCNN
        from aznet_tpu.train.train_az import make_az_train_state
        from aznet_tpu.train.train_frcnn import make_frcnn_train_state
        from aznet_tpu.utils.checkpoint import Checkpointer

        frozen = not args.trunk_trainable
        if frozen and "trunk" not in cfg.TRAIN.FREEZE_PREFIXES:
            cfg = dataclasses.replace(cfg, TRAIN=dataclasses.replace(
                cfg.TRAIN,
                FREEZE_PREFIXES=cfg.TRAIN.FREEZE_PREFIXES + ("trunk",)))
        donor = args.init_trunk_type or ("frcnn" if args.net == "az" else "az")
        donor_net = (build_az_net if donor == "az" else build_frcnn_net)(cfg)
        path = args.init_trunk_from
        deploy = os.path.join(path, "deploy")
        if os.path.isdir(deploy):
            path = deploy  # trunk params are identical in deploy copies
        restored, step = Checkpointer(path).restore({"params": donor_net.params})
        print(f"init trunk from {donor} ckpt {path} (step {step}); "
              f"trunk {'frozen' if frozen else 'trainable (warm start)'}")
        if args.net == "az":
            model = AZNet(model_cfg=cfg.MODEL)
            state = make_az_train_state(
                cfg, model, jax.random.PRNGKey(cfg.RNG_SEED))
        else:
            model = FRCNN(model_cfg=cfg.MODEL)
            state = make_frcnn_train_state(
                cfg, model, jax.random.PRNGKey(cfg.RNG_SEED))
        params = dict(state.params)
        params["params"] = {
            **state.params["params"],
            "trunk": restored["params"]["params"]["trunk"],
        }
        return cfg, state.replace(params=params)

    if args.net == "az":
        cfg, state = trunk_init_state(cfg)
        state, model, outdir = train_az_net(
            cfg, args.imdb, max_iters=args.iters, output_dir=args.output,
            mesh=mesh, state=state
        )
    else:
        if args.proposals:
            with open(args.proposals, "rb") as f:
                props = pickle.load(f)
            proposals_fn = lambda i: props[i % len(props)]
        else:
            # Fall back to jittered-gt proposals (bootstrap mode).
            import numpy as np

            from aznet_tpu.data.imdb import get_imdb
            from aznet_tpu.train.labels import perturb_gt_regions

            imdb = get_imdb(args.imdb)
            rng = np.random.RandomState(cfg.RNG_SEED)

            def proposals_fn(i):
                e = imdb.roidb[i % len(imdb.roidb)]
                return perturb_gt_regions(
                    e["boxes"], (e["height"], e["width"]), 16, rng
                )

        cfg, state = trunk_init_state(cfg)
        state, model, outdir = train_frcnn_net(
            cfg, args.imdb, proposals_fn, max_iters=args.iters,
            output_dir=args.output, mesh=mesh, state=state,
            proposals_path=args.proposals or None
        )
    print(f"done; checkpoints in {outdir}")


if __name__ == "__main__":
    main()
