"""Released-checkpoint loaders (the reference's hubconf.py surface).

``load_resnet50_simhand(path)`` loads the released
``resnet50_simhand.pth`` (GitHub release v1.0 of ut-vision/SiMHand, a
torchvision ResNet-50 state dict) into flax params + batch_stats for this
framework's ``ResNet``/``ContrastiveModel`` encoders.
"""
from __future__ import annotations


def load_resnet50_simhand(path: str):
    """Returns (params, batch_stats) for models.resnet50()."""
    from simhand_tpu.train.torch_port import load_torch_checkpoint

    return load_torch_checkpoint(path)


def load_encoder_into_contrastive(variables: dict, path: str) -> dict:
    """Replaces the encoder subtree of ContrastiveModel variables with
    released weights; projection head stays as initialized."""
    params, stats = load_resnet50_simhand(path)
    out = {
        "params": dict(variables["params"]),
        "batch_stats": dict(variables.get("batch_stats", {})),
    }
    out["params"]["encoder"] = params
    out["batch_stats"]["encoder"] = stats
    return out
