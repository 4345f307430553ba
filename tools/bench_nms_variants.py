#!/usr/bin/env python
"""A/B the batched-NMS wrapper variants on the 16x4096 serving shape.

Round-3 finding 16a: the XLA-side wrapper (argsort + sorted gathers +
scatter unpermute), not the Pallas kernel, is ~2/3 of the NMS program.
This tool measures each wrapper variant plus a kernel-only lower bound
(pre-sorted input, keep returned in sorted order) with the scan-
difference recipe, interleaved in one process.

Usage: python tools/bench_nms_variants.py [--batch 16] [--n 4096]
"""

import argparse
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--n", type=int, default=4096)
    p.add_argument("--tile", type=int, default=512)
    p.add_argument("--reps", type=int, nargs=2, default=(4, 20))
    p.add_argument("--trials", type=int, default=3)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from aznet_tpu.ops.pallas import nms_kernel as nk

    rng = np.random.RandomState(3)
    bsz, n, tile = args.batch, args.n, args.tile
    xy = rng.uniform(0, 2000, (bsz, n, 2)).astype(np.float32)
    wh = rng.uniform(5, 300, (bsz, n, 2)).astype(np.float32)
    boxes = jnp.asarray(np.concatenate([xy, xy + wh], -1))
    scores = jnp.asarray(rng.rand(bsz, n).astype(np.float32))

    def kernel_only(b, s):
        # lower bound: input already sorted+transposed; no unpermute.
        # (s carries the scan's carry perturbation -> the kernel operand
        # varies per step, so XLA cannot hoist the call out of the scan.)
        n_pad = -(-n // tile) * tile  # match the wrappers' padding
        lane = jnp.swapaxes(b, 1, 2) + s[:, None, :] * 1e-20
        lane = jnp.pad(lane, ((0, 0), (0, 0), (0, n_pad - n)))
        num_tiles = n_pad // tile
        valid = jnp.pad(jnp.ones((bsz, 1, n), jnp.float32),
                        ((0, 0), (0, 0), (0, n_pad - n)))
        keep = pl.pallas_call(
            partial(nk._nms_kernel_nosub, 1.0, tile),
            grid=(bsz, num_tiles),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 4, n_pad), lambda b_, i: (b_, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, n_pad), lambda b_, i: (b_, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, num_tiles, tile),
                                   lambda b_, i: (b_, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((bsz, num_tiles, tile),
                                           jnp.float32),
        )(jnp.float32(0.5).reshape(1, 1), lane, valid)
        return keep

    # Every flag explicit: nms_pallas_batched's DEFAULTS track the A/B
    # winner, so relying on them here would alias rows to each other.
    variants = {
        "base": lambda b, s: nk.nms_pallas_batched(
            b, s, 0.5, tile=tile, derive_sub=False, lane_gather=False,
            unpermute="scatter"),
        "derive_sub": lambda b, s: nk.nms_pallas_batched(
            b, s, 0.5, tile=tile, derive_sub=True, lane_gather=False,
            unpermute="scatter"),
        "lane_gather": lambda b, s: nk.nms_pallas_batched(
            b, s, 0.5, tile=tile, derive_sub=False, lane_gather=True,
            unpermute="scatter"),
        "derive+lane": lambda b, s: nk.nms_pallas_batched(
            b, s, 0.5, tile=tile, derive_sub=True, lane_gather=True,
            unpermute="scatter"),
        "lane+gatherup": lambda b, s: nk.nms_pallas_batched(
            b, s, 0.5, tile=tile, derive_sub=False, lane_gather=True,
            unpermute="gather"),
        "intkey": lambda b, s: nk.nms_pallas_batched(
            b, s, 0.5, tile=tile, derive_sub=True, lane_gather=False,
            unpermute="scatter", order_mode="intkey"),
        "intkey+gatherup": lambda b, s: nk.nms_pallas_batched(
            b, s, 0.5, tile=tile, derive_sub=True, lane_gather=False,
            unpermute="gather", order_mode="intkey"),
        # Round-5: ordering INSIDE the kernel (bitonic network over
        # (intkey, idx) carrying the coordinate planes) — the XLA sort
        # and sorted gathers disappear; only the unpermute stays outside.
        "bitonic": lambda b, s: nk.nms_pallas_batched(
            b, s, 0.5, tile=tile, unpermute="scatter",
            order_mode="bitonic"),
        "bitonic+gatherup": lambda b, s: nk.nms_pallas_batched(
            b, s, 0.5, tile=tile, unpermute="gather",
            order_mode="bitonic"),
        # Round-5b: the unpermute moves in-kernel too (a second 2-plane
        # bitonic network sorting (order, keep) by order) — zero XLA-side
        # permutation work left in the NMS program.
        "bitonic+bitonicup": lambda b, s: nk.nms_pallas_batched(
            b, s, 0.5, tile=tile, unpermute="bitonic",
            order_mode="bitonic"),
        "kernel_only": kernel_only,
    }

    lo, hi = args.reps
    progs = {}
    for name, fn in variants.items():
        def make(reps, fn=fn):
            @jax.jit
            def pipe(b, s):
                def step(c, _):
                    keep = fn(b, s + c * 1e-9)
                    return c + jnp.sum(keep.astype(jnp.float32)) * 1e-20, None
                acc, _ = jax.lax.scan(step, jnp.float32(0), None,
                                      length=reps)
                return acc
            return pipe
        progs[name] = (make(lo), make(hi))

    results = {}
    for name in list(progs):
        plo, phi = progs[name]
        try:
            float(plo(boxes, scores))
            float(phi(boxes, scores))
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:160]}")
            del progs[name]
            continue
        results[name] = [0.0, 0.0]
    for _ in range(args.trials):
        for name, (plo, phi) in progs.items():
            t0 = time.perf_counter()
            float(plo(boxes, scores))
            results[name][0] += time.perf_counter() - t0
            t0 = time.perf_counter()
            float(phi(boxes, scores))
            results[name][1] += time.perf_counter() - t0
    for name, (tlo, thi) in results.items():
        dt = (thi - tlo) / args.trials / (hi - lo)
        print(f"{name:12s} {dt * 1e3:7.3f} ms/call  "
              f"({bsz * n / dt / 1e6:7.2f} Mboxes/s)")


if __name__ == "__main__":
    main()
