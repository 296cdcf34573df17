"""PyTorch checkpoint -> smilecode_tpu params converter.

Maps the reference's `state_dict` layouts onto our flax param pytrees so
existing LPBA checkpoints (`dsc*.pth.tar`, `/root/reference/ModeT/train.py:158-163`)
reproduce their Dice / folding numbers on TPU.

Layout rules:
  * Conv3d weight (Cout, Cin, kd, kh, kw)  -> kernel (kd, kh, kw, Cin, Cout)
  * ConvTranspose3d weight (Cin, Cout, k3) -> kernel (k, k, k, Cin, Cout)
  * Linear weight (out, in)                -> kernel (in, out)
  * LayerNorm weight/bias                  -> scale/bias
  * torch Sequential indices `conv.0.` map to our `conv_0` module names.

Use `convert_state_dict(sd, template)` with a params template from
`model.init(...)`; unmatched keys raise with a full report.
"""

from __future__ import annotations

import re

import numpy as np

# Per-family path rename rules (regex on the dotted merged path, applied in
# order; the first candidate present in the params template wins). Needed
# where our flax decomposition flattens a torch wrapper module:
#   * PCnet `ChannelAttention.fc` Sequential -> raw fc1/fc2 params
#   * PCnet/VTN UpConv blocks keep the transpose conv as raw kernel/bias
#     params (torch nests them under `.upconv`)
#   * torch `Sequential(Conv3d, Sigmoid)` single-conv wrappers -> plain conv
#   * PCnet ResBlock `block.2` conv -> our `conv`
RENAMES_BY_MODEL = {
    "pcnet": (
        (r"fc_0\.kernel$", "fc1"),
        (r"fc_2\.kernel$", "fc2"),
        (r"weight_conv_(\d+)_0\.", r"weight_conv_\1."),
        (r"weight_conv_0\.", "weight_conv."),
        (r"(upconv\d)\.upconv\.", r"\1."),
        (r"\.block_2\.", ".conv."),
    ),
    "vtn": ((r"(Upsamp\dto\d|Pred0)\.upconv\.", r"\1."),),
    "rcn": ((r"(Upsamp\dto\d|Pred0)\.upconv\.", r"\1."),),
}


def renames_for(model_name: str):
    name = model_name.lower()
    if name.startswith("rdn"):
        name = "rdn"
    if name in ("prnetplusplus", "prnet++", "prpp"):
        name = "prnet"
    return RENAMES_BY_MODEL.get(name, ())


def _to_numpy(v):
    if hasattr(v, "detach"):
        v = v.detach().cpu().numpy()
    return np.asarray(v)


def torch_key_to_flax_path(key: str) -> tuple[str, ...] | None:
    """Translate one state_dict key to a flax param path.

    Returns None for buffers that have no param equivalent (e.g. the
    SpatialTransformer's registered grid).
    """
    if key.endswith(".grid") or ".transformer" in key or key.endswith("num_batches_tracked"):
        return None
    parts = key.split(".")
    # merge numeric Sequential indices into the preceding module name
    merged = []
    for p in parts:
        if p.isdigit() and merged:
            merged[-1] = f"{merged[-1]}_{p}"
        else:
            merged.append(p)
    *mods, leaf = merged
    leaf_map = {"weight": "kernel", "bias": "bias", "rpb": "rpb", "alpha": "alpha"}
    if mods and mods[-1] == "norm" and leaf in ("weight", "bias"):
        leaf = {"weight": "scale", "bias": "bias"}[leaf]
    else:
        leaf = leaf_map.get(leaf, leaf)
    return tuple(mods) + (leaf,)


def convert_tensor(path: tuple[str, ...], w: np.ndarray, target_shape) -> np.ndarray:
    """Reshape/transpose a torch tensor to the flax param layout."""
    w = _to_numpy(w)
    if w.ndim == 5:
        if w.shape == tuple(target_shape):
            return w
        candidate = w.transpose(2, 3, 4, 1, 0)  # Conv3d
        if candidate.shape == tuple(target_shape):
            return candidate
        candidate = w.transpose(2, 3, 4, 0, 1)  # ConvTranspose3d
        if candidate.shape == tuple(target_shape):
            return candidate
        raise ValueError(f"{path}: cannot map {w.shape} -> {target_shape}")
    if w.ndim == 2:
        if w.shape == tuple(target_shape):
            return w
        if w.T.shape == tuple(target_shape):
            return w.T  # Linear
        raise ValueError(f"{path}: cannot map {w.shape} -> {target_shape}")
    if w.shape != tuple(target_shape):
        raise ValueError(f"{path}: shape mismatch {w.shape} vs {target_shape}")
    return w


def convert_state_dict(state_dict: dict, params_template, renames=()) -> dict:
    """Build a flax params dict {'params': ...} from a torch state_dict.

    ``renames``: optional ((pattern, replacement), ...) regex pairs applied
    to the dotted merged path when the direct mapping misses (see
    RENAMES_BY_MODEL / renames_for).
    """
    import jax

    template = params_template["params"] if "params" in params_template else params_template
    flat_template = _flatten(template)
    out = {}
    used = set()
    for key, w in state_dict.items():
        path = torch_key_to_flax_path(key)
        if path is None:
            continue
        if path not in flat_template and renames:
            dotted = ".".join(path)
            for pat, repl in renames:
                cand = re.sub(pat, repl, dotted)
                if cand != dotted and tuple(cand.split(".")) in flat_template:
                    path = tuple(cand.split("."))
                    break
        if path not in flat_template:
            raise KeyError(
                f"torch key {key!r} -> {path} not in model params. "
                f"Known example paths: {list(flat_template)[:5]}"
            )
        out[path] = convert_tensor(path, w, flat_template[path].shape)
        used.add(path)
    missing = set(flat_template) - used
    if missing:
        raise KeyError(f"params not covered by checkpoint: {sorted(missing)[:10]}")
    nested = _unflatten(out)
    return {"params": jax.tree.map(lambda x: x, nested)}


def _flatten(tree, prefix=()):
    flat = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            flat.update(_flatten(v, prefix + (k,)))
        else:
            flat[prefix + (k,)] = v
    return flat


def _unflatten(flat):
    nested = {}
    for path, v in flat.items():
        node = nested
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = v
    return nested


def load_torch_checkpoint(path: str, model, img_size=(160, 192, 160), renames=()):
    """Load a reference ``.pth.tar`` and return flax params for ``model``."""
    import torch
    import jax
    import jax.numpy as jnp

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("state_dict", ckpt)
    dummy = jnp.zeros((1, *img_size, 1), jnp.float32)
    template = model.init(jax.random.PRNGKey(0), dummy, dummy)
    return convert_state_dict(sd, template, renames=renames)
