#!/usr/bin/env python
"""A/B the VGG trunk variants on hardware: bf16 XLA vs int8 chain/strip.

Uses the scan-difference recipe (DESIGN.md finding 17): run N_lo and N_hi
trunk forwards inside single jitted programs with an unfoldable carry,
difference the wall times over interleaved trials — per-dispatch relay
latency and warmup cancel.

Usage: python tools/bench_trunk.py [--batch 8] [--hw 608 800]
       [--variants bf16,chain,chain_ext,strip]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--hw", type=int, nargs=2, default=(608, 800))
    p.add_argument("--variants", default="bf16,chain,strip",
                   help="also available: chain_ext (measured 2x slower, "
                        "DESIGN.md finding 19), xla_int8")
    p.add_argument("--reps", type=int, nargs=2, default=(2, 6))
    p.add_argument("--trials", type=int, default=3)
    p.add_argument("--trows", type=int, default=0,
                   help="override chain strip height (0 = auto)")
    args = p.parse_args()
    if args.trows:
        os.environ["AZNET_INT8_TROWS"] = str(args.trows)

    import jax
    import jax.numpy as jnp

    from aznet_tpu.models.vgg import VGG16Trunk

    h, w = args.hw
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.uniform(-120, 120, (args.batch, h, w, 3))
                    .astype(np.float32))
    # Scales only steer requant grids; timing is scale-independent.
    scales = tuple(float(s) for s in (30, 25, 20, 15, 12, 10, 8, 8, 6, 6,
                                      5, 5))
    trunks = {
        "bf16": VGG16Trunk(),
        "chain": VGG16Trunk(int8_mode=True, int8_scales=scales),
        "chain_ext": VGG16Trunk(int8_mode=True, int8_scales=scales,
                                int8_chain_from="conv1_2"),
        "strip": VGG16Trunk(int8_mode=True, int8_scales=scales,
                            int8_backend="pallas_strip"),
        "xla_int8": VGG16Trunk(int8_mode=True, int8_scales=scales,
                               int8_backend="xla"),
        # conv1_1 as the exact s2d-2 rewrite (models/vgg.py::conv1_1_s2d)
        "bf16_s2d": VGG16Trunk(conv1_s2d=True),
        "chain_s2d": VGG16Trunk(int8_mode=True, int8_scales=scales,
                                conv1_s2d=True),
    }
    params = trunks["bf16"].init(jax.random.PRNGKey(0), x[:1, :64, :64])

    lo, hi = args.reps
    progs = {}
    for name in args.variants.split(","):
        trunk = trunks[name]

        def make(reps, trunk=trunk):
            @jax.jit
            def pipe(p_, xx):
                def step(c, _):
                    x2 = xx.at[0, 0, 0, 0].set(c)  # unfoldable carry dep
                    y = trunk.apply(p_, x2)
                    return jnp.float32(jnp.sum(y) * 1e-20 + c * 0.5), None

                acc, _ = jax.lax.scan(step, jnp.float32(0), None,
                                      length=reps)
                return acc

            return pipe

        progs[name] = (make(lo), make(hi))

    results = {}
    for name in list(progs):
        plo, phi = progs[name]
        try:
            float(plo(params, x))  # compile + settle
            float(phi(params, x))
        except Exception as e:  # keep the other variants measurable
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}")
            del progs[name]
            continue
        results[name] = [0.0, 0.0]
    for _ in range(args.trials):
        for name, (plo, phi) in progs.items():
            t0 = time.perf_counter()
            float(plo(params, x))
            results[name][0] += time.perf_counter() - t0
            t0 = time.perf_counter()
            float(phi(params, x))
            results[name][1] += time.perf_counter() - t0
    for name, (tlo, thi) in results.items():
        dt = (thi - tlo) / args.trials / (hi - lo)
        ms = dt * 1e3 / args.batch
        print(f"{name:10s} {ms:7.3f} ms/img  ({args.batch / dt:7.1f} img/s "
              f"trunk-only)")


if __name__ == "__main__":
    main()
