"""Synthetic on-disk Hand100M dataset generator.

Stands in for the real Ego4D/100DOH corpora in tests and the CPU smoke
config (SURVEY.md §4 test plan item c): renders simple procedural "hand"
images (skeleton dots on textured background) with known 2D keypoints,
writes JPEG frames and a schema-exact annotation JSON, including
``positive_sample``/``distance`` links between nearby-pose hands from
different "videos".
"""
from __future__ import annotations

import json
import os

import numpy as np


def _render_hand(rng: np.random.Generator, side: int, joints_norm: np.ndarray):
    """Draws dots at the joints over a random background (uint8 RGB)."""
    img = rng.integers(0, 255, size=(side, side, 3), dtype=np.uint8)
    pts = (joints_norm[:, :2] * side).astype(np.int32)
    color = rng.integers(100, 255, size=3)
    for x, y in pts:
        x0, x1 = max(x - 2, 0), min(x + 3, side)
        y0, y1 = max(y - 2, 0), min(y + 3, side)
        img[y0:y1, x0:x1] = color
    return img


def _random_hand_joints(rng: np.random.Generator) -> np.ndarray:
    """Plausible normalized 21x3 keypoints: wrist + 5 fingers of 4 joints."""
    wrist = rng.uniform(0.35, 0.65, size=2)
    joints = np.zeros((21, 3), dtype=np.float32)
    joints[0, :2] = wrist
    for f in range(5):
        ang = rng.uniform(-np.pi, np.pi)
        direction = np.array([np.cos(ang), np.sin(ang)])
        for seg in range(4):
            # ait order: mcp block 1-5, pip 6-10, dip 11-15, tip 16-20
            j = 1 + seg * 5 + f
            joints[j, :2] = wrist + direction * 0.08 * (seg + 1)
    joints[:, :2] = np.clip(joints[:, :2], 0.02, 0.98)
    joints[:, 2] = rng.uniform(-0.2, 0.2, size=21)
    return joints


def generate_synthetic_hand100m(
    root_dir: str,
    num_images: int = 64,
    num_videos: int = 8,
    side: int = 256,
    source: str = "100doh",
    scale: str = "smoke",
    seed: int = 0,
) -> str:
    """Writes a synthetic Hand100M dataset under ``root_dir``.

    Returns the annotation JSON path. Pose-similar pairs across different
    videos get linked as positive samples via an exact MPJPE top-1 search
    (the same metric the real mining job uses).
    """
    try:
        import cv2
    except ImportError as e:  # pragma: no cover
        raise RuntimeError("synthetic dataset generation needs cv2") from e

    rng = np.random.default_rng(seed)
    sub = {"ego4d": "Ego4D", "100doh": "100DOH"}[source.lower()]
    frames_dir = os.path.join(root_dir, "frames", sub)
    os.makedirs(frames_dir, exist_ok=True)

    images, annotations, all_joints, video_ids = [], [], [], []
    for i in range(num_images):
        video = i % num_videos
        joints = _random_hand_joints(rng)
        img = _render_hand(rng, side, joints)
        file_name = os.path.join("frames", sub, f"video{video:03d}_frame{i:06d}.jpg")
        cv2.imwrite(
            os.path.join(root_dir, file_name), cv2.cvtColor(img, cv2.COLOR_RGB2BGR)
        )
        images.append(
            {"id": i, "file_name": file_name, "width": side, "height": side}
        )
        xy = joints[:, :2] * side
        x1, y1 = xy.min(axis=0)
        x2, y2 = xy.max(axis=0)
        annotations.append(
            {
                "image_id": i,
                "hand_id": i,
                "boxes": json.dumps([float(x1), float(y1), float(x2), float(y2)]),
                "keypoint_25d": joints.reshape(-1).tolist(),
                "left_right": "Right" if rng.random() > 0.3 else "Left",
                "positive_sample": [],
                "distance": [],
            }
        )
        all_joints.append(joints[:, :2])
        video_ids.append(video)

    # Exact top-1 cross-video MPJPE pairing.
    J = np.stack(all_joints)  # (N, 21, 2)
    vid = np.asarray(video_ids)
    d = np.linalg.norm(J[:, None] - J[None, :], axis=-1).mean(-1)  # (N, N)
    d[vid[:, None] == vid[None, :]] = np.inf  # exclude same-video
    top1 = d.argmin(axis=1)
    for i, a in enumerate(annotations):
        a["positive_sample"] = [int(top1[i])]
        a["distance"] = [float(d[i, top1[i]])]

    anno_path = os.path.join(
        root_dir, "annotations", sub, f"Hand100M_{sub}_{scale}_v1-1.json"
    )
    os.makedirs(os.path.dirname(anno_path), exist_ok=True)
    with open(anno_path, "w") as f:
        json.dump({"images": images, "annotations": annotations}, f)
    return anno_path
