"""Checkpoint conversion + FULL-MODEL parity against the reference PyTorch
ModeT (imported from /root/reference, skipped when unavailable).

This is the strongest parity test in the suite: random torch weights ->
convert -> our flax ModeT must reproduce the torch forward (moved, flow)
voxel-for-voxel within float tolerance.
"""

import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

REF = "/root/reference/ModeT"

pytestmark = [
    pytest.mark.skipif(not os.path.isdir(REF), reason="reference repo not mounted"),
    pytest.mark.slow,  # full-model torch + flax compiles
]


@pytest.fixture(scope="module")
def torch_modet():
    sys.path.insert(0, REF)
    try:
        import importlib

        import models as ref_models  # /root/reference/ModeT/models.py

        importlib.reload(ref_models)
        yield ref_models
    finally:
        sys.path.remove(REF)


def test_full_model_parity(torch_modet):
    import torch

    torch.manual_seed(0)
    shape = (32, 32, 32)
    tmodel = torch_modet.ModeT(inshape=shape, scale=1)
    tmodel.eval()

    rng = np.random.default_rng(9)
    moving = rng.random((1, 1, *shape)).astype(np.float32)
    fixed = rng.random((1, 1, *shape)).astype(np.float32)
    with torch.no_grad():
        t_moved, t_flow = tmodel(torch.from_numpy(moving), torch.from_numpy(fixed))

    from smilecode_tpu.convert import convert_state_dict
    from smilecode_tpu.models import ModeT

    jmodel = ModeT(qk_scale=1.0)
    jm = jnp.asarray(np.moveaxis(moving, 1, -1))
    jf = jnp.asarray(np.moveaxis(fixed, 1, -1))
    template = jmodel.init(jax.random.PRNGKey(0), jm, jf)
    params = convert_state_dict(tmodel.state_dict(), template)
    params = jax.tree.map(jnp.asarray, params)

    j_moved, j_flow = jmodel.apply(params, jm, jf)

    np.testing.assert_allclose(
        np.asarray(j_moved), np.moveaxis(t_moved.numpy(), 1, -1), atol=2e-4, rtol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(j_flow), np.moveaxis(t_flow.numpy(), 1, -1), atol=2e-4, rtol=1e-3
    )


def test_checkpoint_roundtrip(torch_modet, tmp_path):
    """save_checkpoint-style torch file -> load_torch_checkpoint."""
    import torch

    shape = (16, 16, 16)
    tmodel = torch_modet.ModeT(inshape=shape, scale=1)
    path = tmp_path / "dsc0.700.pth.tar"
    torch.save({"state_dict": tmodel.state_dict(), "epoch": 3}, path)

    from smilecode_tpu.convert import load_torch_checkpoint
    from smilecode_tpu.models import ModeT

    params = load_torch_checkpoint(str(path), ModeT(qk_scale=1.0), img_size=shape)
    assert "params" in params
    leaves = jax.tree.leaves(params)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
