"""Fine-tune dataset registry (reference: minimal-hand/datasets/__init__.py
get_frame_dataset factory — name -> dataset class)."""
from __future__ import annotations

from typing import Any


def get_dataset(name: str, root_dir: str, split: str = "train", **kw) -> Any:
    """Instantiates a fine-tune/eval dataset by its reference name."""
    name = name.lower()
    if name in ("freihand", "fh"):
        from simhand_tpu.finetune.datasets import FreiHand

        return FreiHand(root_dir, split, **kw)
    if name in ("dexycb", "dy"):
        from simhand_tpu.finetune.benchmarks import DexYCB

        return DexYCB(root_dir, split, **kw)
    if name in ("assemblyhands", "ah", "ah-ego"):
        from simhand_tpu.finetune.benchmarks import AssemblyHandsEgo

        return AssemblyHandsEgo(root_dir, split, **kw)
    if name == "ah-exo":
        from simhand_tpu.finetune.benchmarks import AssemblyHandsExo

        return AssemblyHandsExo(root_dir, split, **kw)
    if name == "stb":
        from simhand_tpu.finetune.benchmarks import STB

        return STB(root_dir, split)
    if name == "rhd":
        from simhand_tpu.finetune.benchmarks import RHD

        return RHD(root_dir, split)
    if name in ("cmu", "hand_labels"):
        from simhand_tpu.finetune.benchmarks import CMUHandLabels

        return CMUHandLabels(root_dir, split)
    if name in ("hand143", "panoptic"):
        from simhand_tpu.finetune.benchmarks import CMUPanoptic143

        return CMUPanoptic143(root_dir)
    if name in ("ganerated", "gan"):
        from simhand_tpu.finetune.benchmarks import GANeratedHands

        return GANeratedHands(root_dir)
    if name in ("dexter_object", "do"):
        from simhand_tpu.finetune.benchmarks import DexterObject

        return DexterObject(root_dir)
    if name in ("egodexter", "eo"):
        from simhand_tpu.finetune.benchmarks import EgoDexter

        return EgoDexter(root_dir)
    if name in ("ego4d_hands", "ego4d"):
        from simhand_tpu.finetune.benchmarks import Ego4DHands2D

        return Ego4DHands2D(root_dir, **kw)
    if name == "synthetic":
        from simhand_tpu.finetune.datasets import SyntheticPoseDataset

        return SyntheticPoseDataset(**kw)
    raise KeyError(f"unknown dataset {name!r}")
