"""Test config: run JAX on CPU with 8 virtual devices so multi-chip sharding
paths (pjit/shard_map over a Mesh) are exercised without TPU hardware.

Note: a pytest plugin in this image imports jax before conftest runs, so the
env vars alone are too late — we also update jax.config directly (safe as long
as no backend has been initialized yet, which pytest's import does not do).
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

if "jax" in sys.modules:
    import jax

    jax.config.update("jax_platforms", "cpu")
