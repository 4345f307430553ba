#!/usr/bin/env python
"""Convert extracted Caffe weights (.npz) into an orbax checkpoint.

Reference weights live in .caffemodel protobufs; extract them wherever
pycaffe exists with:

    import caffe, numpy as np
    net = caffe.Net(prototxt, caffemodel, caffe.TEST)
    np.savez("weights.npz", **{f"{k}_W": v[0].data for k, v in net.params.items()},
                            **{f"{k}_b": v[1].data for k, v in net.params.items()})

then on this machine:

    python tools/convert_caffe.py --npz weights.npz --net az --out output/az_converted

The result loads via --ckpt in test_net/propose_net/demo (as a deploy-style
params-only checkpoint — reference snapshots already have the bbox
normalization baked in, so no extra baking is applied).
"""

import argparse
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser(description="Caffe .npz -> aznet_tpu checkpoint")
    p.add_argument("--npz", required=True)
    p.add_argument("--net", choices=("az", "frcnn"), default="az")
    p.add_argument("--out", required=True, help="checkpoint dir to write")
    p.add_argument("--cfg", default=None)
    p.add_argument("--set", dest="set_cfgs", nargs="*", default=[])
    p.add_argument("--zoom-layer", default="zoom_score",
                   help="prototxt name of the zoom head layer")
    p.add_argument("--adj-score-layer", default="adj_score")
    p.add_argument("--adj-bbox-layer", default="adj_bbox")
    args = p.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")

    from aznet_tpu.config import Config, cfg_from_file, cfg_from_list
    from aznet_tpu.api import build_az_net, build_frcnn_net
    from aznet_tpu.utils.checkpoint import Checkpointer
    from aznet_tpu.utils.convert_weights import (
        load_npz, convert_trunk, convert_az_head, convert_frcnn_head,
        _TRUNK_LAYOUTS,
    )

    cfg = Config()
    if args.cfg:
        cfg = cfg_from_file(cfg, args.cfg)
    if args.set_cfgs:
        cfg = cfg_from_list(cfg, args.set_cfgs)
    backbone = cfg.MODEL.BACKBONE
    assert backbone in _TRUNK_LAYOUTS, (
        f"conversion targets the Caffe-lineage trunks {sorted(_TRUNK_LAYOUTS)}, "
        f"not {backbone!r}")

    caffe = load_npz(args.npz)
    trunk = convert_trunk(caffe, backbone)
    last_conv = _TRUNK_LAYOUTS[backbone][0][-1]
    channels = trunk[last_conv]["bias"].shape[0]
    if args.net == "az":
        head = convert_az_head(
            caffe, pool=cfg.MODEL.POOL_SIZE, channels=channels,
            name_map={"zoom_score": args.zoom_layer,
                      "adj_score": args.adj_score_layer,
                      "adj_bbox": args.adj_bbox_layer},
        )
        net = build_az_net(cfg)
    else:
        head = convert_frcnn_head(caffe, pool=cfg.MODEL.POOL_SIZE,
                                  channels=channels)
        net = build_frcnn_net(cfg)

    params = {"params": {"trunk": trunk, "head": head}}
    # Shape-check against a freshly initialized model before writing.
    import jax.numpy as jnp
    import numpy as np

    ref_flat, _ = jax.tree_util.tree_flatten_with_path(net.params)
    new_flat, _ = jax.tree_util.tree_flatten_with_path(params)
    ref_shapes = {jax.tree_util.keystr(k): v.shape for k, v in ref_flat}
    for k, v in new_flat:
        key = jax.tree_util.keystr(k)
        if key not in ref_shapes:
            raise KeyError(f"converted param {key} not in model structure")
        if tuple(v.shape) != tuple(ref_shapes[key]):
            raise ValueError(f"{key}: converted {v.shape} != model {ref_shapes[key]}")
    missing = set(ref_shapes) - {jax.tree_util.keystr(k) for k, _ in new_flat}
    if missing:
        raise KeyError(f"missing converted params: {sorted(missing)[:5]} ...")

    Checkpointer(args.out).save(0, {"params": params})
    print(f"wrote converted {args.net} checkpoint to {args.out}")


if __name__ == "__main__":
    main()
