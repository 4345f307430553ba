#!/usr/bin/env python
"""Micro A/B of the ROI-align implementations at the config-5 search-head
shape (68x120x1024 bf16 conv4 map, 128-roi frontier level, b4 vmap).

The XLA separable path stages a 124 MB [R, P, H, C] intermediate in HBM per
level (VERDICT r4 weak #1); the tiled Pallas kernel avoids it. This tool
times one pooling call per variant with the scan-difference recipe so
kernel iterations don't need a full time_net pipeline compile.

Usage: python tools/bench_roi.py [--b 4] [--r 128] [--hw 68 120] [--c 1024]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--b", type=int, default=4)
    p.add_argument("--r", type=int, default=128)
    p.add_argument("--hw", type=int, nargs=2, default=(68, 120))
    p.add_argument("--c", type=int, default=1024)
    p.add_argument("--reps", type=int, nargs=2, default=(2, 10))
    p.add_argument("--trials", type=int, default=3)
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--only", default=None, help="comma list of variants")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from aznet_tpu.ops.roi_pool import roi_align
    from aznet_tpu.ops.pallas import roi_kernel as rk

    h, w = args.hw
    b, r, c = args.b, args.r, args.c
    rng = np.random.RandomState(0)
    feat = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32),
                       getattr(jnp, args.dtype))
    rois_np = np.zeros((b, r, 4), np.float32)
    rois_np[..., 0] = rng.uniform(0, (w - 8) * 16, (b, r))
    rois_np[..., 1] = rng.uniform(0, (h - 8) * 16, (b, r))
    rois_np[..., 2] = rois_np[..., 0] + rng.uniform(32, 1200, (b, r))
    rois_np[..., 3] = rois_np[..., 1] + rng.uniform(32, 800, (b, r))
    rois = jnp.asarray(rois_np)

    variants = {
        "xla_hfirst": lambda f, rr: roi_align(f, rr, 1 / 16.0, 7,
                                              w_first=False),
        "xla_wfirst": lambda f, rr: roi_align(f, rr, 1 / 16.0, 7,
                                              w_first=True),
        "pallas_big": lambda f, rr: rk.roi_align_pallas_big(
            f, rr, 1 / 16.0, 7),
    }
    for name in dir(rk):  # experimental kernel variants, if present
        if name.startswith("roi_align_pallas_big_v"):
            fn = getattr(rk, name)
            variants[name.replace("roi_align_pallas_big_", "big_")] = (
                lambda f, rr, fn=fn: fn(f, rr, 1 / 16.0, 7))
    if args.only:
        keep = set(args.only.split(","))
        variants = {k: v for k, v in variants.items() if k in keep}

    lo, hi = args.reps
    progs = {}
    for name, fn in variants.items():
        def make(reps, fn=fn):
            @jax.jit
            def pipe(f, rr):
                def step(acc, _):
                    rr2 = rr + acc * 1e-12  # unfoldable carry dependency
                    out = jax.vmap(lambda ff, r3: fn(ff, r3))(f, rr2)
                    return acc + jnp.sum(out.astype(jnp.float32)) * 1e-20, None
                acc, _ = jax.lax.scan(step, jnp.float32(0), None,
                                      length=reps)
                return acc
            return pipe
        progs[name] = (make(lo), make(hi))

    results = {}
    for name in list(progs):
        plo, phi = progs[name]
        try:
            float(plo(feat, rois))
            float(phi(feat, rois))
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:300]}")
            del progs[name]
            continue
        results[name] = [0.0, 0.0]
    for _ in range(args.trials):
        for name, (plo, phi) in progs.items():
            t0 = time.perf_counter()
            float(plo(feat, rois))
            results[name][0] += time.perf_counter() - t0
            t0 = time.perf_counter()
            float(phi(feat, rois))
            results[name][1] += time.perf_counter() - t0
    for name, (tlo, thi) in results.items():
        dt = (thi - tlo) / args.trials / (hi - lo)
        print(f"{name:14s} {dt * 1e3:8.3f} ms/call "
              f"({dt / b * 1e3:7.3f} ms/img-level)")


if __name__ == "__main__":
    main()
