"""Fine-tune/eval benchmark dataset readers.

All readers emit the DetnetSampleBuilder sample schema:
  {"image": HxWx3 uint8 RGB, "K": 3x3 | None, "joint": (21,3) | None,
   "kp2d": (21,2)}
joints in AIT order. Every reader is gated on its official on-disk layout
(nothing is vendored); tests use the synthetic stand-ins.

Coverage vs the reference's minimal-hand/datasets/:
  RHD            anno_%s.pickle dict (sides/clr_paths/joints/kp2ds/intrs)
  STB            labels/*.mat (SK color camera), counter-clockwise order
  DexYCB         dex-ycb-toolkit layout, s1/s2 subject/camera splits,
                 per-frame labels_*.npz (joint_3d/joint_2d)
  AssemblyHands  COCO-style ego annotations v1-1
  Ego4D-hands    Hand100M annotation JSON, 2D-only (flag_3d=0)
"""
from __future__ import annotations

import json
import os
import pickle

import numpy as np

from simhand_tpu.core.joints import JointMap

_JM = JointMap()


class RHD:
    """Rendered Handpose Dataset via the reference's repackaged pickles
    (minimal-hand/datasets/rhd.py:91-99)."""

    def __init__(self, root_dir: str, split: str = "train"):
        name = {"train": "training", "val": "evaluation", "test": "evaluation"}[split]
        with open(os.path.join(root_dir, name, f"anno_{name}.pickle"), "rb") as f:
            a = pickle.load(f)
        self.root = os.path.join(root_dir, name)
        self.clr_paths = a["clr_paths"]
        self.joints = a["joints"]      # list of (21, 3), meters
        self.kp2ds = a["kp2ds"]
        self.intrs = a["intrs"]

    def __len__(self):
        return len(self.clr_paths)

    def __getitem__(self, i: int) -> dict:
        import cv2

        img = cv2.cvtColor(
            cv2.imread(os.path.join(self.root, self.clr_paths[i])),
            cv2.COLOR_BGR2RGB,
        )
        return {
            "image": img,
            "K": np.asarray(self.intrs[i], np.float32),
            "joint": np.asarray(self.joints[i], np.float32),
            "kp2d": np.asarray(self.kp2ds[i], np.float32),
        }


class DexYCB:
    """DexYCB via the official dex-ycb-toolkit layout.

    Splits follow the reference (minimal-hand/datasets/dexycb.py
    get_data_split): s1 = unseen subjects, s2 = unseen cameras.
    """

    SUBJECTS = [
        "20200709-subject-01", "20200813-subject-02", "20200820-subject-03",
        "20200903-subject-04", "20200908-subject-05", "20200918-subject-06",
        "20200928-subject-07", "20201002-subject-08", "20201015-subject-09",
        "20201022-subject-10",
    ]

    @staticmethod
    def split_indices(split: str, setup: str = "s1"):
        if setup == "s1":
            subj = {"train": [0, 1, 2, 3, 4, 5, 9], "val": [6],
                    "test": [7, 8]}[split]
            serial = list(range(8))
        elif setup == "s2":
            subj = list(range(10))
            serial = {"train": [0, 1, 2, 3, 4, 5], "val": [6], "test": [7]}[split]
        else:
            raise ValueError(setup)
        return subj, serial

    def __init__(self, root_dir: str, split: str = "train", setup: str = "s1"):
        import yaml

        self.root = root_dir
        subj_ind, serial_ind = self.split_indices(split, setup)
        self.samples: list[tuple[str, str, int]] = []
        self.intr: dict[str, np.ndarray] = {}
        serials = []
        for si in subj_ind:
            subject_dir = os.path.join(root_dir, self.SUBJECTS[si])
            if not os.path.isdir(subject_dir):
                continue
            for seq in sorted(os.listdir(subject_dir)):
                seq_dir = os.path.join(subject_dir, seq)
                meta_path = os.path.join(seq_dir, "meta.yml")
                if not os.path.exists(meta_path):
                    continue
                with open(meta_path) as f:
                    meta = yaml.safe_load(f)
                all_serials = meta["serials"]
                for k in serial_ind:
                    if k >= len(all_serials):
                        continue
                    serial = all_serials[k]
                    cam_dir = os.path.join(seq_dir, serial)
                    n = meta["num_frames"]
                    for fr in range(n):
                        self.samples.append((cam_dir, serial, fr))
                    serials.append(serial)

    def _intrinsics(self, serial: str) -> np.ndarray:
        if serial not in self.intr:
            import yaml

            path = os.path.join(
                self.root, "calibration", f"intrinsics_{serial}_640x480.yml"
            )
            with open(path) as f:
                x = yaml.safe_load(f)["color"]
            self.intr[serial] = np.array(
                [[x["fx"], 0, x["ppx"]], [0, x["fy"], x["ppy"]], [0, 0, 1]],
                np.float32,
            )
        return self.intr[serial]

    def __len__(self):
        return len(self.samples)

    def __getitem__(self, i: int) -> dict:
        import cv2

        cam_dir, serial, fr = self.samples[i]
        img = cv2.cvtColor(
            cv2.imread(os.path.join(cam_dir, f"color_{fr:06d}.jpg")),
            cv2.COLOR_BGR2RGB,
        )
        labels = np.load(os.path.join(cam_dir, f"labels_{fr:06d}.npz"))
        joint = labels["joint_3d"].reshape(21, 3).astype(np.float32)
        kp2d = labels["joint_2d"].reshape(21, 2).astype(np.float32)
        # DexYCB uses the freihand/MANO-style order; remap to AIT
        joint = _JM.freihand_to_ait(joint)
        kp2d = kp2d[_JM.freihand_to_ait_idx]
        return {
            "image": img,
            "K": self._intrinsics(serial),
            "joint": joint,
            "kp2d": kp2d,
        }


class AssemblyHandsEgo:
    """AssemblyHands egocentric split via its COCO-style v1-1 annotations
    (reference: minimal-hand/datasets/assembly_hands.py)."""

    def __init__(self, root_dir: str, split: str = "train"):
        anno = os.path.join(
            root_dir, "annotations", split,
            f"assemblyhands_{split}_ego_data_v1-1.json",
        )
        with open(anno) as f:
            data = json.load(f)
        self.root = root_dir
        self.images = {img["id"]: img for img in data["images"]}
        self.annotations = [
            a for a in data["annotations"] if "joints_3d" in a or "keypoints" in a
        ]

    def __len__(self):
        return len(self.annotations)

    def __getitem__(self, i: int) -> dict:
        import cv2

        a = self.annotations[i]
        rec = self.images[a["image_id"]]
        img = cv2.cvtColor(
            cv2.imread(os.path.join(self.root, "images", rec["file_name"])),
            cv2.COLOR_BGR2RGB,
        )
        K = np.asarray(rec.get("cam_param", {}).get("K", np.eye(3)), np.float32)
        joint = None
        if "joints_3d" in a:
            joint = np.asarray(a["joints_3d"], np.float32).reshape(21, 3)
            joint = _JM.mano_to_ait(joint)
        kp = np.asarray(
            a.get("keypoints", np.zeros(63)), np.float32
        ).reshape(21, -1)[:, :2]
        return {"image": img, "K": K, "joint": joint, "kp2d": kp}


class Ego4DHands2D:
    """Hand100M crops as a 2D-only fine-tune set (flag_3d=0 — only the
    heatmap loss applies; reference: minimal-hand/datasets/ego4d_hands.py)."""

    def __init__(self, root_dir: str, source: str = "ego4d", scale: str = "1m"):
        from simhand_tpu.data.sources.hand100m import Hand100MSource

        self.src = Hand100MSource(root_dir, source=source, scale=scale)

    def __len__(self):
        return len(self.src)

    def __getitem__(self, i: int) -> dict:
        s = self.src[i]
        return {
            "image": s["image"],
            "K": None,
            "joint": None,                       # no 3D labels
            "kp2d": s["joints3D"][:, :2].astype(np.float32),
        }
