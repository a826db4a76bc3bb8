"""Cross-reader joint-order consistency.

One synthetic hand (freihand/snap order — the fine-tune stack's canonical
order, matching maps.py SNAP_PARENT/JOINT_ROOT_IDX/REF_BONE_LINK and the
reference's minimal-hand convention) is encoded into every reader's native
on-disk layout with that dataset's native joint convention. Every reader
must hand back the SAME canonical joints.

This is the guard the round-1 verdict asked for: a scrambled reader (e.g.
one emitting ait order into the freihand-order map generator) connects
unrelated joints through SNAP_PARENT and silently trains wrong delta/loc
maps; no schema check catches it, only cross-reader equality + the
kinematic-chain sanity below.
"""
import json
import os
import pickle

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from simhand_tpu.core.joints import remap_index
from simhand_tpu.finetune.maps import (
    JOINT_ROOT_IDX,
    REF_BONE_LINK,
    SNAP_PARENT,
)


def canonical_hand() -> np.ndarray:
    """A realistic right hand in camera space (meters), freihand order:
    wrist, then thumb..pinky each mcp/pip/dip/tip. Finger chains extend
    outward so every SNAP_PARENT bone is short (<10cm) while cross-finger
    distances are large — discriminative against order scrambles."""
    joints = np.zeros((21, 3), np.float64)
    joints[0] = [0.0, 0.0, 0.50]  # wrist
    # per-finger direction in the image plane, thumb..pinky
    angles = np.deg2rad([-60.0, -25.0, 0.0, 25.0, 50.0])
    mcp_len = [0.05, 0.09, 0.095, 0.09, 0.08]
    seg = [0.035, 0.025, 0.020]  # mcp->pip, pip->dip, dip->tip
    for f in range(5):
        d = np.array([np.cos(angles[f]), np.sin(angles[f]), 0.12])
        d = d / np.linalg.norm(d)
        base = 1 + 4 * f
        joints[base] = joints[0] + mcp_len[f] * d
        joints[base + 1] = joints[base] + seg[0] * d
        joints[base + 2] = joints[base + 1] + seg[1] * d
        joints[base + 3] = joints[base + 2] + seg[2] * d
    return joints.astype(np.float32)


def test_kinematic_chain_sanity():
    """On the canonical hand, every SNAP_PARENT bone is a real bone."""
    j = canonical_hand()
    bones = np.linalg.norm(
        j[1:] - j[np.asarray(SNAP_PARENT[1:])], axis=-1
    )
    assert bones.max() < 0.10, bones  # all bones anatomical
    assert bones.min() > 0.01, bones
    # the reference bone is wrist -> middle_mcp; loc maps and alignment
    # root at the WRIST (handataset.py:81, align.py:13)
    assert REF_BONE_LINK == (0, 9)
    assert JOINT_ROOT_IDX == 0
    a, b = REF_BONE_LINK
    assert 0.08 < np.linalg.norm(j[b] - j[a]) < 0.11
    # distance from wrist grows monotonically along each finger chain
    for f in range(5):
        chain = [1 + 4 * f + k for k in range(4)]
        d = [np.linalg.norm(j[c] - j[0]) for c in chain]
        assert all(d[k] < d[k + 1] for k in range(3)), (f, d)
    # a scrambled order (the old bug: ait-order joints through the
    # freihand-order SNAP_PARENT) must fail the bone check
    ait_scramble = j[remap_index("freihand", "ait")]
    bad = np.linalg.norm(
        ait_scramble[1:] - ait_scramble[np.asarray(SNAP_PARENT[1:])], axis=-1
    )
    assert bad.max() > 0.10  # connects unrelated joints


# ---------------------------------------------------------------------------
# per-dataset fixture writers (native conventions) -> reader -> canonical
# ---------------------------------------------------------------------------

def _img(rng, h=480, w=640):
    return rng.integers(0, 255, (h, w, 3), dtype=np.uint8)


def _project(joints, K):
    uvw = joints @ np.asarray(K, np.float32).T
    return (uvw[:, :2] / uvw[:, 2:]).astype(np.float32)


K_DEFAULT = np.array(
    [[500.0, 0, 320.0], [0, 500.0, 240.0], [0, 0, 1.0]], np.float32
)


def _write_freihand(root, joints, rng):
    os.makedirs(os.path.join(root, "training", "rgb"), exist_ok=True)
    with open(os.path.join(root, "training_K.json"), "w") as f:
        json.dump([K_DEFAULT.tolist()], f)
    with open(os.path.join(root, "training_xyz.json"), "w") as f:
        json.dump([joints.tolist()], f)  # native = freihand order
    with open(os.path.join(root, "training_scale.json"), "w") as f:
        json.dump([1.0], f)
    cv2.imwrite(os.path.join(root, "training", "rgb", "00000000.jpg"),
                _img(rng))


def _read_freihand(root):
    from simhand_tpu.finetune.datasets import FreiHand

    return FreiHand(root, "train", train_ratio=1.0, replicate=False)[0]


def _write_rhd(root, joints, rng):
    d = os.path.join(root, "training")
    os.makedirs(os.path.join(d, "color"), exist_ok=True)
    cv2.imwrite(os.path.join(d, "color", "00000.png"), _img(rng))
    anno = {
        "sides": ["r"],
        "clr_paths": [os.path.join("color", "00000.png")],
        "joints": [joints],  # repack pickles are freihand order
        "kp2ds": [_project(joints, K_DEFAULT)],
        "intrs": [K_DEFAULT],
    }
    with open(os.path.join(d, "anno_training.pickle"), "wb") as f:
        pickle.dump(anno, f)


def _read_rhd(root):
    from simhand_tpu.finetune.benchmarks import RHD

    return RHD(root, "train")[0]


def _write_dexycb(root, joints, rng):
    import yaml

    subj = "20200709-subject-01"
    seq_dir = os.path.join(root, subj, "seq0")
    cam = "836212060125"
    os.makedirs(os.path.join(seq_dir, cam), exist_ok=True)
    with open(os.path.join(seq_dir, "meta.yml"), "w") as f:
        yaml.safe_dump({"serials": [cam], "num_frames": 1}, f)
    os.makedirs(os.path.join(root, "calibration"), exist_ok=True)
    with open(os.path.join(
            root, "calibration", f"intrinsics_{cam}_640x480.yml"), "w") as f:
        yaml.safe_dump({"color": {
            "fx": float(K_DEFAULT[0, 0]), "fy": float(K_DEFAULT[1, 1]),
            "ppx": float(K_DEFAULT[0, 2]), "ppy": float(K_DEFAULT[1, 2]),
        }}, f)
    cv2.imwrite(os.path.join(seq_dir, cam, "color_000000.jpg"), _img(rng))
    np.savez(os.path.join(seq_dir, cam, "labels_000000.npz"),
             joint_3d=joints[None],           # native = freihand order
             joint_2d=_project(joints, K_DEFAULT)[None])


def _read_dexycb(root):
    from simhand_tpu.finetune.benchmarks import DexYCB

    return DexYCB(root, "train", setup="s1")[0]


def _write_stb(root, joints, rng):
    import scipy.io as sio

    from simhand_tpu.finetune.benchmarks import (
        STB_SK_ROT_VEC,
        STB_SK_TRANS_VEC,
        STB_TO_SNAP,
        _rodrigues_quat,
    )

    # invert the reader transform: right->left mirror (the reader flips
    # every STB sample to right), palm stored instead of wrist,
    # snap -> stb gather, m -> mm, color-cam -> depth-cam
    snap = joints.astype(np.float64).copy()
    snap[:, 0] = -snap[:, 0]                              # store as LEFT
    # wrist -> palm: invert ge_palm2wrist (ring_mcp + 2.0x, stb.py:125)
    snap[0] = snap[13] + (snap[0] - snap[13]) / 2.0
    snap_mm = snap * 1000.0
    stb = snap_mm[np.asarray(STB_TO_SNAP)]                # stb[i] = snap[STB_TO_SNAP[i]]
    rot = _rodrigues_quat(STB_SK_ROT_VEC)
    raw = stb @ rot.T + STB_SK_TRANS_VEC[None]
    os.makedirs(os.path.join(root, "labels"), exist_ok=True)
    for seq in ("B1Counting", "B1Random"):
        os.makedirs(os.path.join(root, "images", seq), exist_ok=True)
        sio.savemat(os.path.join(root, "labels", f"{seq}_SK.mat"),
                    {"handPara": raw.T[:, :, None]})      # (3, 21, N)
        cv2.imwrite(os.path.join(root, "images", seq, "SK_color_0.png"),
                    _img(rng))


def _read_stb(root):
    from simhand_tpu.finetune.benchmarks import STB

    return STB(root, "test")[0]


def _write_ah(root, joints, rng):
    anno = os.path.join(root, "annotations", "train")
    os.makedirs(anno, exist_ok=True)
    os.makedirs(os.path.join(root, "images"), exist_ok=True)
    # native = interhand layout (tips-first per finger, wrist last), mm
    fh_to_ih = remap_index("freihand", "interhand")
    right_ih = joints[fh_to_ih] * 1000.0
    world = np.concatenate([right_ih, np.zeros((21, 3))]).tolist()
    data = {
        "images": [{"id": 0, "seq_name": "s", "camera": "cam0",
                    "frame_idx": 7, "file_name": "f.jpg",
                    "width": 640, "height": 480}],
        "annotations": [{"id": 0, "image_id": 0,
                         "bbox": {"right": [100, 100, 300, 300],
                                  "left": None},
                         "joint_valid": [1] * 42}],
    }
    calib = {"calibration": {"s": {
        "intrinsics": {"cam0_mono10bit": K_DEFAULT.tolist()},
        "extrinsics": {"000007": {
            "cam0_mono10bit": np.hstack(
                [np.eye(3), np.zeros((3, 1))]).tolist()}},
    }}}
    j3d = {"annotations": {"s": {"000007": {"world_coord": world}}}}
    with open(os.path.join(
            anno, "assemblyhands_train_ego_data_v1-1.json"), "w") as f:
        json.dump(data, f)
    with open(os.path.join(
            anno, "assemblyhands_train_ego_calib_v1-1.json"), "w") as f:
        json.dump(calib, f)
    with open(os.path.join(
            anno, "assemblyhands_train_joint_3d_v1-1.json"), "w") as f:
        json.dump(j3d, f)
    cv2.imwrite(os.path.join(root, "images", "f.jpg"), _img(rng))


def _read_ah(root):
    from simhand_tpu.finetune.benchmarks import AssemblyHandsEgo

    return AssemblyHandsEgo(root, "train", crop=False)[0]


def _write_ganerated(root, joints, rng):
    d = os.path.join(root, "noObject", "0001")
    os.makedirs(d, exist_ok=True)
    base = os.path.join(d, "0001")
    np.savetxt(base + "_joint_pos.txt", joints.reshape(1, -1), delimiter=",")
    np.savetxt(base + "_joint2D.txt",
               _project(joints, K_DEFAULT).reshape(1, -1), delimiter=",")
    cv2.imwrite(base + "_color_composed.png", _img(rng, 256, 256))


def _read_ganerated(root):
    from simhand_tpu.finetune.benchmarks import GANeratedHands

    return GANeratedHands(root)[0]


READERS_3D = {
    "freihand": (_write_freihand, _read_freihand),
    "rhd": (_write_rhd, _read_rhd),
    "dexycb": (_write_dexycb, _read_dexycb),
    "stb": (_write_stb, _read_stb),
    "ah-ego": (_write_ah, _read_ah),
    "ganerated": (_write_ganerated, _read_ganerated),
}


@pytest.mark.parametrize("name", sorted(READERS_3D))
def test_reader_emits_canonical_order(name, tmp_path):
    write, read = READERS_3D[name]
    joints = canonical_hand()
    rng = np.random.default_rng(0)
    root = str(tmp_path / name)
    os.makedirs(root, exist_ok=True)
    write(root, joints, rng)
    s = read(root)
    np.testing.assert_allclose(
        s["joint"], joints, atol=5e-4,
        err_msg=f"{name} does not emit canonical freihand-order joints",
    )
    # kp2d agrees with the dataset's own 2D annotation convention:
    # where K is available it must match the projection of the joints.
    # STB excepted: the reference mirrors kp2d as W - x while keeping the
    # original K (stb.py:376-380) — exact re-projection of the mirrored
    # joint would need cx' = W - cx, so the identity holds only up to
    # 2*(W/2 - cx) in x; the joint/kp2d are each reference-exact.
    if s.get("K") is not None and name != "stb":
        np.testing.assert_allclose(
            s["kp2d"], _project(s["joint"], s["K"]), atol=2.0,
            err_msg=f"{name} kp2d does not match its joint projection",
        )


def test_tip_only_readers_use_freihand_tip_slots(tmp_path):
    """DexterObject/EgoDexter park their 5 fingertips at the freihand tip
    indices [4, 8, 12, 16, 20] (reference: utils/align.py:31)."""
    from simhand_tpu.finetune.benchmarks import (
        FINGERTIP_IDS,
        DexterObject,
        EgoDexter,
    )

    assert FINGERTIP_IDS == [4, 8, 12, 16, 20]

    rng = np.random.default_rng(1)
    tips = rng.uniform(10, 100, (5, 2)).astype(np.float32)
    line = ",".join(f"{v:.2f}" for v in tips.reshape(-1))

    do_root = tmp_path / "do"
    d = do_root / "data" / "Grasp1"
    (d / "annotations").mkdir(parents=True)
    (d / "color").mkdir()
    (d / "annotations" / "Grasp1.txt").write_text(line + "\n")
    cv2.imwrite(str(d / "color" / "color_00000.png"), _img(rng))
    s = DexterObject(str(do_root))[0]
    np.testing.assert_allclose(s["kp2d"][FINGERTIP_IDS], tips, atol=0.01)
    other = np.delete(np.arange(21), FINGERTIP_IDS)
    assert not s["kp2d"][other].any()

    eo_root = tmp_path / "eo"
    d = eo_root / "data" / "Desk"
    (d / "color").mkdir(parents=True)
    (d / "annotation.txt").write_text(line + "\n")
    cv2.imwrite(str(d / "color" / "image_00000_color.png"), _img(rng))
    s = EgoDexter(str(eo_root))[0]
    np.testing.assert_allclose(s["kp2d"][FINGERTIP_IDS], tips, atol=0.01)


def test_ego4d_2d_reader_remaps_ait_to_freihand(tmp_path):
    """Hand100M annotations are ait order; the 2D fine-tune reader must
    hand out freihand order like every other reader."""
    from simhand_tpu.core.joints import JointMap
    from simhand_tpu.data.sources import (
        Hand100MSource,
        generate_synthetic_hand100m,
    )
    from simhand_tpu.finetune.benchmarks import Ego4DHands2D

    jm = JointMap()
    root = str(tmp_path / "h100m")
    generate_synthetic_hand100m(root, num_images=4, num_videos=2, side=64,
                                scale="smoke")
    src = Hand100MSource(root, source="100doh", scale="smoke")
    ds = Ego4DHands2D(root, source="100doh", scale="smoke")
    want = src[0]["joints3D"][:, :2][jm.ait_to_freihand_idx]
    np.testing.assert_allclose(ds[0]["kp2d"], want.astype(np.float32))
