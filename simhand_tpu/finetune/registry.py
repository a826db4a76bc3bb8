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
    if name == "synthetic-hand":
        from simhand_tpu.finetune.datasets import SyntheticPoseDataset

        return SyntheticPoseDataset(render_joints=True, **kw)
    raise KeyError(f"unknown dataset {name!r}")


DATASET_KEYS = (
    "freihand", "fh", "dexycb", "dy", "assemblyhands", "ah", "ah-ego",
    "ah-exo", "stb", "rhd", "cmu", "hand_labels", "hand143", "panoptic",
    "ganerated", "gan", "dexter_object", "do", "egodexter", "eo",
    "ego4d_hands", "ego4d", "synthetic", "synthetic-hand",
)

# keys whose constructor takes no split argument
_NO_SPLIT = {"hand143", "panoptic", "ganerated", "gan", "dexter_object",
             "do", "egodexter", "eo", "ego4d_hands", "ego4d", "synthetic",
             "synthetic-hand"}


def build_composed_dataset(
    names: str | list[str],
    roots: str | list[str],
    split: str = "train",
    setup: str = "s1",
    weights: list[float] | None = None,
    epoch_size: int | None = None,
    seed: int = 0,
    synthetic_n: int = 64,
):
    """Builds the (possibly multi-set) fine-tune dataset the reference's
    HandDataset hub assembles from ``subset_name=[...]``
    (minimal-hand/datasets/handataset.py:36-242).

    ``names``: one registry key or a comma-separated/explicit list.
    ``roots``: one root used for every set, or a list matching ``names``.
    No ``weights`` -> plain concatenation (reference index-routing
    semantics); ``weights`` -> deterministic per-sample weighted mix.
    """
    from simhand_tpu.finetune.datasets import ConcatDataset, WeightedMixDataset

    if isinstance(names, str):
        names = [n.strip() for n in names.split(",") if n.strip()]
    if isinstance(roots, str):
        roots = [r.strip() or None for r in roots.split(",")]
    elif roots is None:
        roots = [None]
    if len(roots) == 1 and len(names) > 1:
        roots = list(roots) * len(names)
    assert len(roots) == len(names), (names, roots)

    sets = []
    for name, root in zip(names, roots):
        kw: dict = {}
        key = name.lower()
        if key in ("dexycb", "dy"):
            kw["setup"] = setup
        if key in ("synthetic", "synthetic-hand"):
            kw["n"] = synthetic_n
            kw["seed"] = 0 if split == "train" else 1
        if key in _NO_SPLIT:
            sets.append(get_dataset(key, root, **kw))
        else:
            sets.append(get_dataset(key, root, split, **kw))
    if len(sets) == 1 and weights is None:
        return sets[0]
    if weights is None:
        return ConcatDataset(sets)
    return WeightedMixDataset(sets, weights, epoch_size=epoch_size, seed=seed)
