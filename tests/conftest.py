"""Test config: run JAX on CPU with 8 virtual devices so multi-chip sharding
paths (pjit/shard_map over a Mesh) are exercised without TPU hardware.

Two environment quirks force the config.update route (env vars do NOT work):
  * a pytest plugin in this image imports jax before conftest runs;
  * the axon sitecustomize pins JAX_PLATFORMS to the TPU tunnel for every
    python process, overriding shell env assignments.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # harmless; the config updates below rule

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
# persistent compilation cache: the heavyweight CPU compiles (full-model
# parity/sharding tests) reload in seconds on re-runs
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: multi-minute CPU compiles (full-model parity/sharding)"
    )
