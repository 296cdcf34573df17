"""Numerical parity of the 6 baseline model families vs the reference
PyTorch implementations (random torch weights -> converter -> our flax
forward must reproduce (moved, flow) voxel-for-voxel within float tolerance).

Mirrors tests/test_convert.py's ModeT strategy for:
  Im2grid   `Baseline methods/Im2Grid/models.py:325-386`
  PCNet     `Baseline methods/PCnet/models.py:324-428`
  PRNet     `Baseline methods/PR++/models.py:284-316`
  PRNet++   `Baseline methods/PR++/models.py:318-352`
  VTN/RCN   `Baseline methods/RCN/models.py:210-356`
  RDN (+share/diff)  `Baseline methods/RDN/models.py:217-978`
"""

import importlib.util
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from smilecode_tpu.convert import convert_state_dict, renames_for

REF = "/root/reference/Baseline methods"

pytestmark = [
    pytest.mark.skipif(not os.path.isdir(REF), reason="reference repo not mounted"),
    pytest.mark.slow,  # per-model torch-vs-flax full forwards
]

_loaded = {}


def load_ref(subdir):
    """Import `<REF>/<subdir>/models.py` under a unique module name, with
    torch .cuda() neutralized (PR++ builds a ones-kernel .cuda() in a ctor,
    `PR++/models.py:226`; the smoke blocks at file bottom are __main__-gated)."""
    if subdir in _loaded:
        return _loaded[subdir]
    import torch

    if not getattr(torch.Tensor, "_cuda_patched", False):
        torch.Tensor.cuda = lambda self, *a, **k: self
        torch.Tensor._cuda_patched = True
    path = os.path.join(REF, subdir, "models.py")
    spec = importlib.util.spec_from_file_location(f"ref_{subdir.lower()}_models", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    _loaded[subdir] = mod
    return mod


def _rand_pair(shape, seed=3):
    rng = np.random.default_rng(seed)
    moving = rng.random((1, 1, *shape)).astype(np.float32)
    fixed = rng.random((1, 1, *shape)).astype(np.float32)
    return moving, fixed


def assert_parity(tmodel, jmodel, shape, model_name, atol=2e-4, n_outputs=2, seed=3):
    """torch weights -> converter -> flax forward == torch forward."""
    import torch

    tmodel.eval()
    moving, fixed = _rand_pair(shape, seed)
    with torch.no_grad():
        t_out = tmodel(torch.from_numpy(moving), torch.from_numpy(fixed))

    jm = jnp.asarray(np.moveaxis(moving, 1, -1))
    jf = jnp.asarray(np.moveaxis(fixed, 1, -1))
    template = jmodel.init(jax.random.PRNGKey(0), jm, jf)
    params = convert_state_dict(
        tmodel.state_dict(), template, renames=renames_for(model_name)
    )
    params = jax.tree.map(jnp.asarray, params)
    j_out = jmodel.apply(params, jm, jf)

    assert len(t_out) == len(j_out)
    for i in range(n_outputs):
        np.testing.assert_allclose(
            np.asarray(j_out[i]),
            np.moveaxis(t_out[i].numpy(), 1, -1),
            atol=atol,
            rtol=1e-3,
            err_msg=f"{model_name} output {i}",
        )


def test_im2grid_parity():
    ref = load_ref("Im2Grid")
    import torch

    torch.manual_seed(0)
    shape = (32, 32, 32)
    from smilecode_tpu.models import Im2grid

    # zero-init projections make the attention nearly uniform; perturb the
    # weights so the test exercises non-trivial attention paths
    tmodel = ref.Im2grid(inshape=shape)
    with torch.no_grad():
        for name, p in tmodel.named_parameters():
            if "proj" in name:
                p.add_(torch.randn_like(p) * 0.1)
    assert_parity(tmodel, Im2grid(), shape, "im2grid")


def test_pcnet_parity():
    ref = load_ref("PCnet")
    import torch

    torch.manual_seed(1)
    shape = (16, 16, 16)
    from smilecode_tpu.models import PCNet

    tmodel = ref.PCNet(inshape=shape)
    assert_parity(tmodel, PCNet(), shape, "pcnet")


def test_prnet_parity():
    ref = load_ref("PR++")
    import torch

    torch.manual_seed(2)
    shape = (16, 16, 16)
    from smilecode_tpu.models import PRNet

    tmodel = ref.PRNet(size=shape)
    with torch.no_grad():  # excite the N(0,1e-5) flow heads
        for name, p in tmodel.named_parameters():
            if "flow" in name:
                p.add_(torch.randn_like(p) * 0.05)
    assert_parity(tmodel, PRNet(), shape, "prnet")


def test_prnetplusplus_parity():
    ref = load_ref("PR++")
    import torch

    torch.manual_seed(3)
    shape = (16, 16, 16)
    from smilecode_tpu.models import PRNetPlusPlus

    tmodel = ref.PRNetplusplus(size=shape)
    with torch.no_grad():
        for name, p in tmodel.named_parameters():
            if "flow" in name:
                p.add_(torch.randn_like(p) * 0.05)
    assert_parity(tmodel, PRNetPlusPlus(), shape, "prnetplusplus")


@pytest.mark.slow
def test_vtn_parity():
    ref = load_ref("RCN")
    import torch

    torch.manual_seed(4)
    shape = (64, 64, 64)
    from smilecode_tpu.models import VTN

    tmodel = ref.VTN(inshape=shape)
    assert_parity(tmodel, VTN(), shape, "vtn")


@pytest.mark.slow
def test_rcn_parity():
    ref = load_ref("RCN")
    import torch

    torch.manual_seed(5)
    shape = (64, 64, 64)
    from smilecode_tpu.models import RCN

    tmodel = ref.RCN(inshape=shape, n_cascade=2)
    # training-variant outputs: (moved, flow, *subflows)
    assert_parity(tmodel, RCN(n_cascade=2), shape, "rcn", n_outputs=4)


def test_rdn_parity():
    ref = load_ref("RDN")
    import torch

    torch.manual_seed(6)
    shape = (32, 32, 32)
    from smilecode_tpu.models import RDN

    tmodel = ref.RDN(inshape=shape, stage_recursion=2, level_recursion=[1, 1, 1, 2])
    with torch.no_grad():
        for name, p in tmodel.named_parameters():
            if "conv.4" in name:
                p.add_(torch.randn_like(p) * 0.05)
    jmodel = RDN(stages=2, levels=(1, 1, 1, 2), share_weights=False, diff=False)
    assert_parity(tmodel, jmodel, shape, "rdn", n_outputs=4)


def test_rdn_diff_share_parity():
    ref = load_ref("RDN")
    import torch

    torch.manual_seed(7)
    shape = (32, 32, 32)
    from smilecode_tpu.models import RDN

    tmodel = ref.RDN_diff_share(
        inshape=shape, stage_recursion=2, level_recursion=[1, 1, 1, 2]
    )
    with torch.no_grad():
        for name, p in tmodel.named_parameters():
            if "conv.4" in name:
                p.add_(torch.randn_like(p) * 0.05)
    jmodel = RDN(stages=2, levels=(1, 1, 1, 2), share_weights=True, diff=True)
    assert_parity(tmodel, jmodel, shape, "rdn_diff_share", n_outputs=4)
