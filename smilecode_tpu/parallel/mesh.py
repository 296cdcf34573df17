"""Device mesh + sharding helpers (the framework's entire "distributed layer").

The reference is single-process single-GPU with `.cuda()` calls scattered
through the code (SURVEY.md section 2.5). The TPU-native design centralizes
device placement here:

  * a ("data",) mesh for batch data-parallelism over LPBA pairs — pairs are
    independent, so DP is pure sharding: annotate the batch axis, jit the
    step, and XLA inserts the psum over ICI for the gradient reduction;
  * an optional ("data", "spatial") mesh for spatial sharding of the D axis
    (halo-exchange parallelism, see `smilecode_tpu.parallel.spatial`) when a
    volume + activations exceed one chip's HBM.

No per-tensor device calls anywhere else in the framework.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(dp: int = 1, spatial: int = 1, devices=None) -> Mesh | None:
    """Create a (data[, spatial]) mesh over the first dp*spatial devices.

    Returns None for the trivial single-device case (no sharding needed).
    """
    n = dp * spatial
    if n <= 1:
        return None
    devices = devices if devices is not None else jax.devices()
    if len(devices) < n:
        raise ValueError(f"need {n} devices, have {len(devices)}")
    dev = np.asarray(devices[:n]).reshape(dp, spatial)
    if spatial == 1:
        return Mesh(dev.reshape(dp), ("data",))
    return Mesh(dev, ("data", "spatial"))


def batch_spec(mesh: Mesh) -> P:
    if "spatial" in mesh.axis_names:
        return P("data", "spatial")  # shard batch AND the D axis
    return P("data")


def shard_batch(mesh: Mesh | None, arrays):
    """Place batch arrays (B, D, H, W, C) with the batch axis sharded."""
    if mesh is None:
        return arrays
    sharding = NamedSharding(mesh, batch_spec(mesh))
    return jax.tree.map(lambda a: jax.device_put(a, sharding), arrays)


def replicate(mesh: Mesh | None, tree):
    """Fully replicate a pytree (params/opt state) over the mesh."""
    if mesh is None:
        return tree
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda a: jax.device_put(a, sharding), tree)
