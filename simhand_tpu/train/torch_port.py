"""Checkpoint interop with the reference's released torch formats.

Two directions (reference: port_model.py:7-48, hubconf.py:6-23):

* ``encoder_to_torch_state_dict`` — flax encoder params + batch_stats ->
  a torchvision-ResNet-style state dict (the ``resnet50_simhand.pth``
  release format), saved via ``torch.save``.
* ``torch_state_dict_to_encoder`` — a torchvision ResNet state dict
  (e.g. ImageNet init, or the released SiMHand weights) -> flax params +
  batch_stats for our ``ResNet``.

Mapping is purely name/layout based:
  conv kernels:  torch (O, I, kH, kW) <-> flax (kH, kW, I, O)
  dense kernels: torch (O, I)         <-> flax (I, O)
  BN:            weight/bias <-> scale/bias;
                 running_mean/var <-> batch_stats mean/var
  module names:  layer{s}.{b}.conv1 <-> layer{s}_{b}/conv1
                 layer{s}.{b}.downsample.{0,1} <-> downsample_{conv,bn}
"""
from __future__ import annotations

from typing import Any

import numpy as np


def _flax_paths(tree: dict, prefix=()) -> dict:
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_flax_paths(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = v
    return out


def _torch_module_name(flax_module: str) -> str:
    """'layer1_0' -> 'layer1.0'; 'conv1'/'bn1' unchanged."""
    if flax_module.startswith("layer"):
        stage, block = flax_module.split("_")
        return f"{stage}.{block}"
    return flax_module


def _flax_module_name(torch_module: str) -> str:
    return torch_module.replace(".", "_")


def encoder_to_torch_state_dict(params: dict, batch_stats: dict) -> dict:
    """flax ResNet variables -> torchvision-keyed numpy state dict.

    Returns numpy arrays; wrap with torch.tensor at save time so this
    module stays importable without torch.
    """
    sd: dict[str, np.ndarray] = {}

    def put(key: str, arr):
        sd[key] = np.asarray(arr)

    for path, value in _flax_paths(params).items():
        *modules, leaf = path
        prefix_parts = []
        for m in modules:
            if m.startswith("layer"):
                prefix_parts.append(_torch_module_name(m))
            elif m == "downsample_conv":
                prefix_parts.append("downsample.0")
            elif m == "downsample_bn":
                prefix_parts.append("downsample.1")
            else:
                prefix_parts.append(m)
        # conv modules: last path element is the module (conv1 etc.) and
        # leaf is 'kernel'; BN modules hold scale/bias.
        if leaf == "kernel":
            name = ".".join(prefix_parts)
            arr = np.asarray(value)
            if arr.ndim == 4:  # conv (kH, kW, I, O) -> (O, I, kH, kW)
                put(f"{name}.weight", arr.transpose(3, 2, 0, 1))
            else:  # dense (I, O) -> (O, I)
                put(f"{name}.weight", arr.T)
        elif leaf == "scale":
            put(".".join(prefix_parts) + ".weight", value)
        elif leaf == "bias":
            put(".".join(prefix_parts) + ".bias", value)
        else:
            raise ValueError(f"unexpected param leaf {path}")

    for path, value in _flax_paths(batch_stats).items():
        *modules, leaf = path
        prefix_parts = []
        for m in modules:
            if m.startswith("layer"):
                prefix_parts.append(_torch_module_name(m))
            elif m == "downsample_conv":
                prefix_parts.append("downsample.0")
            elif m == "downsample_bn":
                prefix_parts.append("downsample.1")
            else:
                prefix_parts.append(m)
        name = ".".join(prefix_parts)
        if leaf == "mean":
            put(f"{name}.running_mean", value)
        elif leaf == "var":
            put(f"{name}.running_var", value)
        else:
            raise ValueError(f"unexpected batch_stats leaf {path}")
    return sd


def torch_state_dict_to_encoder(sd: dict) -> tuple[dict, dict]:
    """torchvision ResNet state dict -> (params, batch_stats) flax trees."""
    params: dict[str, Any] = {}
    batch_stats: dict[str, Any] = {}

    def insert(tree, path, value):
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = np.asarray(value)

    for key, value in sd.items():
        if key.startswith("fc.") or key.endswith("num_batches_tracked"):
            continue
        parts = key.split(".")
        leaf = parts[-1]
        modules = parts[:-1]
        # Re-join layerN.B -> layerN_B; downsample.{0,1} -> downsample_{conv,bn}
        flax_mods: list[str] = []
        i = 0
        while i < len(modules):
            m = modules[i]
            if m.startswith("layer") and i + 1 < len(modules) and modules[i + 1].isdigit():
                flax_mods.append(f"{m}_{modules[i + 1]}")
                i += 2
            elif m == "downsample":
                idx = modules[i + 1]
                flax_mods.append("downsample_conv" if idx == "0" else "downsample_bn")
                i += 2
            else:
                flax_mods.append(m)
                i += 1

        arr = np.asarray(value)
        if leaf == "weight":
            if arr.ndim == 4:
                insert(params, flax_mods + ["kernel"], arr.transpose(2, 3, 1, 0))
            elif arr.ndim == 2:
                insert(params, flax_mods + ["kernel"], arr.T)
            else:  # BN weight
                insert(params, flax_mods + ["scale"], arr)
        elif leaf == "bias":
            insert(params, flax_mods + ["bias"], arr)
        elif leaf == "running_mean":
            insert(batch_stats, flax_mods + ["mean"], arr)
        elif leaf == "running_var":
            insert(batch_stats, flax_mods + ["var"], arr)
        else:
            raise ValueError(f"unexpected torch key {key}")
    return params, batch_stats


def save_torch_checkpoint(path: str, params: dict, batch_stats: dict) -> None:
    """Saves the encoder in the released ``resnet50_simhand.pth`` format."""
    import torch

    sd = encoder_to_torch_state_dict(params, batch_stats)
    torch.save(
        {k: torch.from_numpy(np.ascontiguousarray(v).copy()) for k, v in sd.items()},
        path,
    )


def load_torch_checkpoint(path: str) -> tuple[dict, dict]:
    """Loads a torchvision-style ResNet .pth into flax trees."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    sd = {k: v.numpy() for k, v in sd.items()}
    return torch_state_dict_to_encoder(sd)
