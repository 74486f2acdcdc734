"""Convert reference (torch) RPEFlow checkpoints to flax variable trees.

The reference stores checkpoints as ``{last_epoch, last_step, state_dict,
best_metrics}`` (reference train.py:227-232). This module maps the
``state_dict`` names onto the rpeflow_tpu module tree, which was deliberately
named to make the mapping mechanical:

  torch                                  flax
  -----                                  ----
  a.b.0.conv_fn.weight  [O,I,kh,kw]  ->  a/b_0/conv_fn/kernel  [kh,kw,I,O]
  ....conv_fn.weight    [O,I,k]      ->  .../kernel            [k,I,O]
  ....linear.weight     [O,I]        ->  .../linear/kernel     [I,O]
  ....norm_fn.weight                 ->  .../norm_fn/scale          (BatchNorm)
  ....norm_fn.running_mean           ->  batch_stats: .../norm_fn/mean
  ....norm1x.body.weight             ->  .../norm1x/weight          (LayerNorm)
  ....up_mask_head_2d.0.weight       ->  .../up_mask_head_2d/layers_0/kernel
  ....attn.temperature               ->  .../attn/temperature

``num_batches_tracked`` entries are dropped (flax BatchNorm does not track
them and the reference never reads them).
"""

from __future__ import annotations

import re
from typing import Any, Dict, Mapping

import numpy as np


def _to_numpy(t) -> np.ndarray:
    if isinstance(t, np.ndarray):
        return t
    return t.detach().cpu().numpy()  # torch tensor


def _set_nested(tree: dict, path: list[str], value: np.ndarray) -> None:
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def convert_state_dict(state_dict: Mapping[str, Any]) -> Dict[str, dict]:
    """Convert a torch state_dict to ``{'params': ..., 'batch_stats': ...}``."""
    params: dict = {}
    batch_stats: dict = {}

    for name, tensor in state_dict.items():
        if name.endswith("num_batches_tracked"):
            continue
        if name.startswith("module."):  # DDP prefix
            name = name[len("module."):]

        # Sequential indices of the RAFT upsample-mask head get explicit
        # names; the head lives inside the remat'd convex-upsampler module.
        name = name.replace("up_mask_head_2d.0.",
                            "convex_upsampler.up_mask_head_2d.layers_0.")
        name = name.replace("up_mask_head_2d.2.",
                            "convex_upsampler.up_mask_head_2d.layers_2.")
        # LayerNorm wrapper module in the reference ('body') is flattened here.
        name = name.replace(".body.", ".")
        # ModuleList indices: 'a.3.b' -> 'a_3.b'
        name = re.sub(r"\.(\d+)\.", r"_\1.", name)

        parts = name.split(".")
        leaf = parts[-1]
        path = parts[:-1]
        arr = _to_numpy(tensor)

        if leaf == "running_mean":
            _set_nested(batch_stats, path + ["mean"], arr)
        elif leaf == "running_var":
            _set_nested(batch_stats, path + ["var"], arr)
        elif leaf == "weight":
            if arr.ndim == 4:  # conv2d [O, I/g, kh, kw] -> [kh, kw, I/g, O]
                _set_nested(params, path + ["kernel"], arr.transpose(2, 3, 1, 0))
            elif arr.ndim == 3:  # conv1d [O, I/g, k] -> [k, I/g, O]
                _set_nested(params, path + ["kernel"], arr.transpose(2, 1, 0))
            elif arr.ndim == 2:  # linear [O, I] -> [I, O]
                _set_nested(params, path + ["kernel"], arr.transpose(1, 0))
            elif arr.ndim == 1:
                if path and path[-1] == "norm_fn":  # BatchNorm scale
                    _set_nested(params, path + ["scale"], arr)
                else:  # channel LayerNorm weight
                    _set_nested(params, path + ["weight"], arr)
            else:
                raise ValueError(f"unhandled weight rank for {name}: {arr.shape}")
        elif leaf in ("bias", "temperature"):
            _set_nested(params, path + [leaf], arr)
        else:
            raise ValueError(f"unhandled state_dict entry: {name}")

    out = {"params": params}
    if batch_stats:
        out["batch_stats"] = batch_stats
    return out


def load_torch_checkpoint(path: str) -> Dict[str, Any]:
    """Load a reference ``.pt`` checkpoint file into a flax variable tree.

    Returns ``{'variables': {...}, 'last_epoch': int, 'last_step': int,
    'best_metrics': Any}`` (missing keys default sensibly).
    """
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    state_dict = ckpt.get("state_dict", ckpt)
    return {
        "variables": convert_state_dict(state_dict),
        "last_epoch": ckpt.get("last_epoch", -1),
        "last_step": ckpt.get("last_step", -1),
        "best_metrics": ckpt.get("best_metrics", None),
    }


def assert_compatible(variables: Mapping, converted: Mapping, path: str = "") -> None:
    """Recursively check that converted arrays match the model's tree/shapes."""
    for key, val in variables.items():
        sub = f"{path}/{key}"
        if key not in converted:
            raise KeyError(f"missing in converted checkpoint: {sub}")
        if isinstance(val, Mapping):
            assert_compatible(val, converted[key], sub)
        else:
            if tuple(val.shape) != tuple(converted[key].shape):
                raise ValueError(
                    f"shape mismatch at {sub}: model {val.shape} vs "
                    f"checkpoint {converted[key].shape}")


def _flatten(tree: Mapping, prefix=()) -> Dict[tuple, np.ndarray]:
    out = {}
    for key, val in tree.items():
        if isinstance(val, Mapping):
            out.update(_flatten(val, prefix + (key,)))
        else:
            out[prefix + (key,)] = np.asarray(val)
    return out


def to_torch_state_dict(variables: Mapping[str, Any]) -> Dict[str, np.ndarray]:
    """Inverse of :func:`convert_state_dict`: flax variables -> reference
    torch state_dict names/layouts (numpy values; wrap in torch.from_numpy
    to load). Enables exporting rpeflow_tpu checkpoints back to the
    reference implementation and recording torch-side parity fixtures.

    Roundtrip invariant (tested): convert_state_dict(to_torch_state_dict(v))
    reproduces ``v`` exactly.
    """
    flat = {}
    flat.update({("params",) + k: v
                 for k, v in _flatten(variables.get("params", {})).items()})
    flat.update({("stats",) + k: v
                 for k, v in _flatten(variables.get("batch_stats", {})).items()})

    out: Dict[str, np.ndarray] = {}
    for path, arr in flat.items():
        kind, *comps, leaf = path
        # module-list naming: trailing pure-numeric suffix '_N' -> '.N'
        comps = [re.sub(r"_(\d+)$", r".\1", c) for c in comps]
        name = ".".join(comps)
        # the RAFT mask head is an nn.Sequential inside the wrapper (not a
        # remat'd submodule) in the reference
        name = name.replace("convex_upsampler.up_mask_head_2d.layers.",
                            "up_mask_head_2d.")

        if kind == "stats":
            out[f"{name}.running_{leaf}" if leaf in ("mean", "var")
                else f"{name}.{leaf}"] = arr
            if leaf == "mean":  # torch BatchNorm also tracks a step counter
                out[f"{name}.num_batches_tracked"] = np.asarray(0, np.int64)
            continue

        parent = comps[-1] if comps else ""
        if leaf == "kernel":
            if arr.ndim == 4:
                out[f"{name}.weight"] = arr.transpose(3, 2, 0, 1)
            elif arr.ndim == 3:
                out[f"{name}.weight"] = arr.transpose(2, 1, 0)
            elif arr.ndim == 2:
                out[f"{name}.weight"] = arr.transpose(1, 0)
            else:
                raise ValueError(f"unhandled kernel rank at {name}: {arr.shape}")
        elif leaf == "scale":  # BatchNorm
            out[f"{name}.weight"] = arr
        elif leaf == "weight":  # channel LayerNorm ('body' wrapper upstream)
            out[f"{name}.body.weight"] = arr
        elif leaf == "bias":
            # LayerNorm biases live under the upstream 'body' wrapper; all
            # other biases (convs, BatchNorm 'norm_fn') map directly
            if parent in ("norm1x", "norm1y", "norm2"):
                out[f"{name}.body.bias"] = arr
            else:
                out[f"{name}.bias"] = arr
        elif leaf == "temperature":
            out[f"{name}.temperature"] = arr
        else:
            raise ValueError(f"unhandled param leaf at {name}: {leaf}")
    return out
