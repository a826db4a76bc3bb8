"""Dataset readers: schema checks on synthetic fixture files."""
import os
import pickle

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")


def test_rhd_reader(tmp_path):
    from simhand_tpu.finetune.benchmarks import RHD

    root = tmp_path / "rhd"
    (root / "training").mkdir(parents=True)
    (root / "training" / "color").mkdir()
    rng = np.random.default_rng(0)
    clr_paths, joints, kp2ds, intrs = [], [], [], []
    for i in range(3):
        name = os.path.join("color", f"{i:05d}.png")
        cv2.imwrite(
            str(root / "training" / name),
            rng.integers(0, 255, (64, 64, 3), dtype=np.uint8),
        )
        clr_paths.append(name)
        joints.append(rng.normal(size=(21, 3)).astype(np.float32))
        kp2ds.append(rng.uniform(0, 64, (21, 2)).astype(np.float32))
        intrs.append(np.eye(3, dtype=np.float32))
    anno = {
        "sides": ["r"] * 3, "clr_paths": clr_paths, "mask_paths": clr_paths,
        "joints": joints, "kp2ds": kp2ds, "intrs": intrs,
        "centers": [np.zeros(2)] * 3, "my_scales": [1.0] * 3,
    }
    with open(root / "training" / "anno_training.pickle", "wb") as f:
        pickle.dump(anno, f)

    ds = RHD(str(root), "train")
    assert len(ds) == 3
    s = ds[0]
    assert s["image"].shape == (64, 64, 3)
    assert s["joint"].shape == (21, 3)
    assert s["kp2d"].shape == (21, 2)


def test_rhd_reader_official_layout(tmp_path):
    """The OFFICIAL RHD_published_v2 pickle (per-frame dicts, both hands
    stacked 42-joint) parses directly: majority-visible side selected,
    rhd (tip->mcp) order reordered to snap, mask-based crop scale
    (reference rhd.py:131-196)."""
    from simhand_tpu.finetune.benchmarks import RHD, RHD_TO_SNAP

    root = tmp_path / "rhd"
    (root / "training" / "color").mkdir(parents=True)
    (root / "training" / "mask").mkdir()
    rng = np.random.default_rng(1)
    anno = {}
    for i in range(2):
        cv2.imwrite(str(root / "training" / "color" / f"{i:05d}.png"),
                    rng.integers(0, 255, (64, 64, 3), dtype=np.uint8))
        mask = np.zeros((64, 64), np.uint8)
        mask[10:40, 20:44] = 20          # right-hand segment ids 18-33
        cv2.imwrite(str(root / "training" / "mask" / f"{i:05d}.png"), mask)
        uv_vis = np.zeros((42, 3), np.float32)
        uv_vis[21:, :2] = rng.uniform(5, 60, (21, 2))
        uv_vis[21:, 2] = 1.0             # right hand fully visible
        xyz = rng.normal(size=(42, 3)).astype(np.float32)
        anno[i] = {"uv_vis": uv_vis, "xyz": xyz,
                   "K": np.eye(3, dtype=np.float32)}
    with open(root / "training" / "anno_training.pickle", "wb") as f:
        pickle.dump(anno, f)

    ds = RHD(str(root), "train")
    assert len(ds) == 2
    s = ds[0]
    assert s["image"].shape == (64, 64, 3)
    # right side selected + rhd->snap reorder
    np.testing.assert_allclose(
        s["joint"], anno[0]["xyz"][21:][RHD_TO_SNAP], atol=1e-6
    )
    np.testing.assert_allclose(
        s["kp2d"], anno[0]["uv_vis"][21:, :2][RHD_TO_SNAP], atol=1e-6
    )
    # mask-based scale: max(mask extent, kp extent) * 2.0
    kp_ext = float(np.max(s["kp2d"].max(0) - s["kp2d"].min(0)))
    assert float(s["my_scale"]) == pytest.approx(2.0 * max(30.0, kp_ext))
    assert "center" in s

    # left-majority frames are mirrored to right (rhd.py:234,252-257)
    anno[1]["uv_vis"][:21] = anno[1]["uv_vis"][21:]
    anno[1]["uv_vis"][21:] = 0.0
    with open(root / "training" / "anno_training.pickle", "wb") as f:
        pickle.dump(anno, f)
    ds2 = RHD(str(root), "train")
    sl = ds2[1]
    raw_kp = anno[1]["uv_vis"][:21, :2][RHD_TO_SNAP]
    np.testing.assert_allclose(sl["kp2d"][:, 0], 64 - raw_kp[:, 0],
                               atol=1e-5)
    np.testing.assert_allclose(
        sl["joint"][:, 0], -anno[1]["xyz"][:21][RHD_TO_SNAP][:, 0],
        atol=1e-6,
    )
    np.testing.assert_array_equal(sl["image"], ds[1]["image"][:, ::-1])


def test_ego4d_hands_2d_reader(tmp_path):
    from simhand_tpu.data.sources import generate_synthetic_hand100m
    from simhand_tpu.finetune.benchmarks import Ego4DHands2D

    root = str(tmp_path / "h100m")
    generate_synthetic_hand100m(root, num_images=8, num_videos=2, side=128,
                                scale="smoke")
    ds = Ego4DHands2D(root, source="100doh", scale="smoke")
    s = ds[0]
    assert s["joint"] is None  # 2D-only -> flag_3d = 0 downstream
    assert s["kp2d"].shape == (21, 2)

    # it feeds the detnet builder with flag_3d=0
    from simhand_tpu.finetune.datasets import DetnetSampleBuilder

    builder = DetnetSampleBuilder(train=True)
    out = builder(ds[0], np.random.default_rng(0))
    assert out["flag_3d"] == 0.0
    assert out["hm"].shape == (32, 32, 21)


def test_pair_grid(tmp_path):
    from simhand_tpu.data.sources import Hand100MSource, generate_synthetic_hand100m
    from simhand_tpu.mining.visualize import pair_grid

    root = str(tmp_path / "h100m")
    generate_synthetic_hand100m(root, num_images=16, num_videos=4, side=128,
                                scale="smoke")
    src = Hand100MSource(root, source="100doh", scale="smoke")
    grid = pair_grid(src, n=2, cell=32)
    assert grid.shape == (64, 128, 3)
    assert grid.dtype == np.uint8
    assert grid.sum() > 0


def test_stb_reader(tmp_path):
    import scipy.io as sio

    from simhand_tpu.finetune.benchmarks import STB, STB_SK_INTR

    root = tmp_path / "stb"
    (root / "labels").mkdir(parents=True)
    rng = np.random.default_rng(1)
    for seq in ("B1Counting", "B1Random"):
        (root / "images" / seq).mkdir(parents=True)
        # 2 frames of 21 plausible depth-cam joints (mm)
        hand = rng.uniform(-50, 50, (3, 21, 2)) + np.array([0, 0, 500])[:, None, None]
        sio.savemat(str(root / "labels" / f"{seq}_SK.mat"), {"handPara": hand})
        for i in range(2):
            cv2.imwrite(
                str(root / "images" / seq / f"SK_color_{i}.png"),
                rng.integers(0, 255, (480, 640, 3), dtype=np.uint8),
            )
    ds = STB(str(root), "test")
    assert len(ds) == 4
    s = ds[0]
    assert s["joint"].shape == (21, 3)
    assert s["kp2d"].shape == (21, 2)
    np.testing.assert_array_equal(s["K"], STB_SK_INTR)
    # joints in meters, plausible depth
    assert 0.1 < np.abs(s["joint"][:, 2]).mean() < 2.0


def test_cmu_hand_labels_reader(tmp_path):
    from simhand_tpu.finetune.benchmarks import CMUHandLabels

    root = tmp_path / "cmu"
    d = root / "manual_train"
    d.mkdir(parents=True)
    rng = np.random.default_rng(2)
    import json as _json

    for i in range(2):
        pts = rng.uniform(0, 100, (21, 3)).tolist()
        with open(d / f"img{i}.json", "w") as f:
            _json.dump({"hand_pts": pts, "is_left": 0}, f)
        cv2.imwrite(
            str(d / f"img{i}.jpg"),
            rng.integers(0, 255, (64, 64, 3), dtype=np.uint8),
        )
    ds = CMUHandLabels(str(root), "train")
    assert len(ds) == 2
    s = ds[0]
    assert s["kp2d"].shape == (21, 2)
    assert s["joint"] is None


def test_assemblyhands_reader(tmp_path):
    import json as _json

    from simhand_tpu.finetune.benchmarks import AssemblyHandsEgo

    root = tmp_path / "ah"
    anno = root / "annotations" / "train"
    anno.mkdir(parents=True)
    (root / "images").mkdir()
    rng = np.random.default_rng(3)

    K = [[400.0, 0, 320], [0, 400.0, 240], [0, 0, 1]]
    Rt = np.hstack([np.eye(3), np.zeros((3, 1))]).tolist()
    world = (rng.uniform(-50, 50, (42, 3)) + np.array([0, 0, 600])).tolist()

    data = {
        "images": [{
            "id": 0, "seq_name": "seqA", "camera": "cam0", "frame_idx": 7,
            "file_name": "f.jpg", "width": 640, "height": 480,
        }],
        "annotations": [{
            "id": 0, "image_id": 0,
            "bbox": {"right": [100, 100, 300, 300], "left": None},
            "joint_valid": [1] * 42,
        }],
    }
    calib = {"calibration": {"seqA": {
        "intrinsics": {"cam0_mono10bit": K},
        "extrinsics": {"000007": {"cam0_mono10bit": Rt}},
    }}}
    joints = {"annotations": {"seqA": {"000007": {"world_coord": world}}}}

    with open(anno / "assemblyhands_train_ego_data_v1-1.json", "w") as f:
        _json.dump(data, f)
    with open(anno / "assemblyhands_train_ego_calib_v1-1.json", "w") as f:
        _json.dump(calib, f)
    with open(anno / "assemblyhands_train_joint_3d_v1-1.json", "w") as f:
        _json.dump(joints, f)
    cv2.imwrite(str(root / "images" / "f.jpg"),
                rng.integers(0, 255, (480, 640, 3), dtype=np.uint8))

    ds = AssemblyHandsEgo(str(root), "train")
    assert len(ds) == 1  # left bbox is None
    s = ds[0]
    assert s["image"].shape == (224, 224, 3)
    assert s["joint"].shape == (21, 3)
    assert s["kp2d"].shape == (21, 2)
    # reprojection through the updated K matches the cropped kp2d
    uvw = s["joint"] @ s["K"].T
    reproj = uvw[:, :2] / uvw[:, 2:]
    np.testing.assert_allclose(reproj, s["kp2d"], atol=2.0)


def test_assemblyhands_exo_and_filters(tmp_path):
    """Exo modality reads the _exo_ triplet; joint_valid<10 hands and
    invalid-list entries are dropped like the reference."""
    import json as _json

    from simhand_tpu.finetune.benchmarks import AssemblyHandsEgo, AssemblyHandsExo

    root = tmp_path / "ah"
    anno = root / "annotations" / "val"
    anno.mkdir(parents=True)
    (root / "images").mkdir()
    rng = np.random.default_rng(4)

    K = [[400.0, 0, 320], [0, 400.0, 240], [0, 0, 1]]
    Rt = np.hstack([np.eye(3), np.zeros((3, 1))]).tolist()
    world = (rng.uniform(-50, 50, (42, 3)) + np.array([0, 0, 600])).tolist()

    data = {
        "images": [
            {"id": 0, "seq_name": "seqA", "camera": "exo0", "frame_idx": 7,
             "file_name": "a.jpg", "width": 640, "height": 480},
            {"id": 1, "seq_name": "seqA", "camera": "exo0", "frame_idx": 7,
             "file_name": "b.jpg", "width": 640, "height": 480},
        ],
        "annotations": [
            # right valid, left has <10 valid joints -> left dropped
            {"id": 0, "image_id": 0,
             "bbox": {"right": [100, 100, 300, 300],
                      "left": [100, 100, 300, 300]},
             "joint_valid": [1] * 21 + [1] * 5 + [0] * 16},
            # both valid, but right (hand_id 0) is on the invalid list
            {"id": 1, "image_id": 1,
             "bbox": {"right": [100, 100, 300, 300],
                      "left": [100, 100, 300, 300]},
             "joint_valid": [1] * 42},
        ],
    }
    calib = {"calibration": {"seqA": {
        "intrinsics": {"exo0_mono10bit": K},
        "extrinsics": {"000007": {"exo0_mono10bit": Rt}},
    }}}
    joints = {"annotations": {"seqA": {"000007": {"world_coord": world}}}}

    with open(anno / "assemblyhands_val_exo_data_v1-1.json", "w") as f:
        _json.dump(data, f)
    with open(anno / "assemblyhands_val_exo_calib_v1-1.json", "w") as f:
        _json.dump(calib, f)
    with open(anno / "assemblyhands_val_joint_3d_v1-1.json", "w") as f:
        _json.dump(joints, f)
    img = rng.integers(0, 255, (480, 640, 3), dtype=np.uint8)
    cv2.imwrite(str(root / "images" / "a.jpg"), img)
    cv2.imwrite(str(root / "images" / "b.jpg"), img)

    # joint_valid filter alone (no invalid list): drops ann0's left hand
    ds = AssemblyHandsExo(str(root), "val")
    assert len(ds) == 3
    s = ds[0]
    assert s["image"].shape == (224, 224, 3)
    assert s["joint"].shape == (21, 3)

    # invalid list takes over completely when present
    with open(anno / "invalid_val_exo.txt", "w") as f:
        f.write("b.jpg,0\n")
    ds = AssemblyHandsExo(str(root), "val")
    names = [(ds.images[a["image_id"]]["file_name"], h) for a, h in ds.samples]
    assert ("b.jpg", "right") not in names
    assert ("a.jpg", "left") in names  # joint_valid filter not re-applied
    assert len(ds) == 3

    # ego reader does not see the exo triplet
    import pytest
    with pytest.raises(FileNotFoundError):
        AssemblyHandsEgo(str(root), "val")

    from simhand_tpu.finetune.registry import get_dataset
    assert len(get_dataset("ah-exo", str(root), "val")) == 3


def test_dexter_object_color_frame_projection(tmp_path):
    """With 3D tip files present, DO projects through the vendored color
    camera chain: RAW mm values (the reference's /1000-then-x1000 round
    trip is a net no-op, dexter_object.py:167,238), x/y negated, every
    sample mirrored. The 32001 occlusion sentinel and partially
    annotated lines become invalid tips WITHOUT shifting the row-index
    -> frame pairing."""
    from simhand_tpu.finetune.benchmarks import (
        DO_M_COLOR,
        FINGERTIP_IDS,
        DexterObject,
    )

    root = tmp_path / "do"
    seq = root / "data" / "Grasp1"
    (seq / "annotations").mkdir(parents=True)
    (seq / "color").mkdir()
    rng = np.random.default_rng(3)
    # realistic DO geometry: mm units, tips ~0.5 m in front of the
    # depth camera (negated-x/y frame -> z positive after negation)
    tips3d = np.zeros((3, 5, 3), np.float32)
    tips3d[..., 0] = rng.uniform(-60, 60, (3, 5))
    tips3d[..., 1] = rng.uniform(-60, 60, (3, 5))
    tips3d[..., 2] = rng.uniform(400, 700, (3, 5))
    tips3d[1, 2] = 32001.0                   # occluded tip sentinel
    lines = [
        "; ".join(", ".join(f"{v:.4f}" for v in tip) for tip in row)
        for row in tips3d[:2]
    ]
    lines.append("; ".join(                  # frame 2: only 3 tips
        ", ".join(f"{v:.4f}" for v in tip) for tip in tips3d[2, :3]))
    (seq / "annotations" / "my_Grasp13D.txt").write_text("\n".join(lines))
    for i in range(3):
        cv2.imwrite(str(seq / "color" / f"color_{i:05d}.png"),
                    rng.integers(0, 255, (480, 640, 3), dtype=np.uint8))

    ds = DexterObject(str(root))
    assert len(ds) == 3

    def want_tips(row):
        # the reference chain, transcribed independently: negate x/y of
        # the raw-mm values, project homogeneously, mirror x
        j = row * np.array([-1.0, -1.0, 1.0])
        uv = DO_M_COLOR @ np.concatenate([j.T, np.ones((1, 5))], axis=0)
        w = (uv[:2] / uv[2]).T
        w[:, 0] = 640 - w[:, 0]
        return w

    s0 = ds[0]
    np.testing.assert_allclose(
        s0["kp2d"][FINGERTIP_IDS], want_tips(tips3d[0]), atol=1e-2
    )
    assert s0["tip_only"] and "center" in s0 and "my_scale" in s0
    # depth is ~0.5 m: the extrinsic translation (~19 mm) must matter —
    # a unit slip (x1000) would suppress it by >20 px
    no_trans = (DO_M_COLOR[:, :3] @ (tips3d[0] * [-1, -1, 1]).T)
    no_trans = (no_trans[:2] / no_trans[2]).T
    no_trans[:, 0] = 640 - no_trans[:, 0]
    assert np.abs(s0["kp2d"][FINGERTIP_IDS] - no_trans).max() > 5.0

    # sentinel tip invalid, row alignment preserved
    s1 = ds[1]
    assert (s1["kp2d"][FINGERTIP_IDS][2] == 0).all()
    assert (s1["kp2d"][FINGERTIP_IDS][[0, 1, 3, 4]] != 0).any(axis=1).all()
    # frame 2 pairs with color_00002 despite its short line; tips 3-4
    # invalid
    s2 = ds[2]
    np.testing.assert_allclose(
        s2["kp2d"][FINGERTIP_IDS][:3], want_tips(tips3d[2])[:3], atol=1e-2
    )
    assert (s2["kp2d"][FINGERTIP_IDS][3:] == 0).all()
