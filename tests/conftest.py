"""Test configuration: force an 8-virtual-device CPU mesh.

The ambient environment registers a remote-TPU ('axon') PJRT plugin via
sitecustomize and forces ``jax_platforms='axon,cpu'`` at interpreter start,
so env vars alone are too late — we override through jax.config here, before
any backend is used. Multi-device sharding tests then run on the virtual
8-device CPU mesh (--xla_force_host_platform_device_count). Real-TPU runs
use bench.py / tools, not the unit suite.
"""

import os
import sys

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

assert jax.devices()[0].platform == "cpu", "tests must run on the CPU backend"
assert len(jax.devices()) == 8, "expected 8 virtual CPU devices"
