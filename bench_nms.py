"""Secondary benchmark: NMS throughput (Mboxes/sec) — the BASELINE metric's
NMS component. Prints one JSON line per implementation tier.

The reference's Cython CPU NMS processes ~0.1-1 Mboxes/s on a host core;
here: the exact-greedy Pallas kernel, the pure-JAX fixpoint, and the C++
host implementation.
"""

from __future__ import annotations

import json
import time

import numpy as np


def main():
    import sys

    import jax

    if "--cpu" in sys.argv:
        # The ambient sitecustomize force-selects the remote-TPU platform;
        # env vars alone do NOT override it (see .claude/skills/verify).
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from aznet_tpu.ops.nms import nms_mask, nms
    from aznet_tpu.ops.pallas import nms_pallas
    from aznet_tpu.utils import native

    rng = np.random.RandomState(3)

    def dets_of(n):
        xy = rng.uniform(0, 2000, (n, 2))
        wh = rng.uniform(5, 300, (n, 2))
        s = rng.permutation(n).astype(np.float32) / n
        return np.concatenate([xy, xy + wh, s[:, None]], 1).astype(np.float32)

    on_tpu = jax.devices()[0].platform != "cpu"
    results = {}

    def bench_device(name, fn, n, lo=4, hi=20):
        # Scan-difference timing (DESIGN.md findings 16a/17): reps scanned
        # INSIDE one jitted program with an unfoldable carry dependency,
        # then two scan lengths differenced — a per-call loop on the remote
        # relay measures its ~30 ms dispatch latency, not the kernel.
        d = dets_of(n)
        b, s = jnp.asarray(d[:, :4]), jnp.asarray(d[:, 4])

        def pipe_n(reps):
            @jax.jit
            def pipe(b, s):
                def step(c, _):
                    out = fn(b, s + c * 1e-9)
                    return c + jnp.sum(out.astype(jnp.float32)) * 1e-20, None
                acc, _ = jax.lax.scan(step, jnp.float32(0), None, length=reps)
                return acc
            return pipe

        plo, phi = pipe_n(lo), pipe_n(hi)
        float(plo(b, s))
        float(phi(b, s))
        tlo = thi = 0.0
        for _ in range(3):
            t0 = time.perf_counter()
            float(plo(b, s))
            tlo += time.perf_counter() - t0
            t0 = time.perf_counter()
            float(phi(b, s))
            thi += time.perf_counter() - t0
        dt = (thi - tlo) / 3 / (hi - lo)
        results[f"{name}_n{n}"] = round(n / dt / 1e6, 3)

    if on_tpu:
        for n in (8192, 32768):
            bench_device("pallas", lambda b, s: nms_pallas(b, s, 0.5), n)
    bench_device("jax_fixpoint", lambda b, s: nms_mask(b, s, 0.5), 4096)

    if native.available():
        d = dets_of(8192)
        t0 = time.perf_counter()
        reps = 10
        for _ in range(reps):
            nms(d, 0.5)
        dt = (time.perf_counter() - t0) / reps
        results["cpp_host_n8192"] = round(8192 / dt / 1e6, 3)

    best = max(results.values()) if results else 0.0
    print(json.dumps({"metric": "nms_mboxes_per_sec", "value": best,
                      "unit": "Mboxes/s", "detail": results}))


if __name__ == "__main__":
    main()
