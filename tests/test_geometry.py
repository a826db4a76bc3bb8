import jax
import jax.numpy as jnp
import numpy as np
import pytest

from simhand_tpu.core import geometry
from simhand_tpu.core.joints import (
    CHILD_JOINT,
    PARENT_JOINT,
    JointMap,
    remap_index,
)


def random_hand(rng, batch=4):
    """Random plausible camera-space hands + intrinsics."""
    joints = rng.uniform(-0.1, 0.1, size=(batch, 21, 3)).astype(np.float32)
    joints[..., 2] += 0.6  # in front of the camera
    K = np.array(
        [[480.0, 0.0, 112.0], [0.0, 480.0, 112.0], [0.0, 0.0, 1.0]],
        dtype=np.float32,
    )
    K = np.broadcast_to(K, (batch, 3, 3)).copy()
    return joints, K


def test_convert_to_2_5d_matches_manual():
    rng = np.random.default_rng(0)
    joints, K = random_hand(rng)
    j25, scale = geometry.convert_to_2_5d(jnp.asarray(K), jnp.asarray(joints))
    j25, scale = np.asarray(j25), np.asarray(scale)

    for b in range(joints.shape[0]):
        expected_scale = np.linalg.norm(
            joints[b, CHILD_JOINT] - joints[b, PARENT_JOINT]
        )
        assert scale[b] == pytest.approx(expected_scale, rel=1e-5)
        proj = (K[b] @ joints[b].T).T / joints[b][:, -1:]
        np.testing.assert_allclose(j25[b, :, :2], proj[:, :2], rtol=1e-4)
        zrel = (joints[b][:, 2] - joints[b][PARENT_JOINT, 2]) / expected_scale
        np.testing.assert_allclose(j25[b, :, 2], zrel, rtol=1e-4, atol=1e-5)


def test_2_5d_roundtrip_recovers_3d():
    rng = np.random.default_rng(1)
    joints, K = random_hand(rng, batch=8)
    j25, scale = geometry.convert_to_2_5d(jnp.asarray(K), jnp.asarray(joints))
    j3d = geometry.convert_2_5d_to_3d(j25, scale, jnp.asarray(K))
    np.testing.assert_allclose(np.asarray(j3d), joints, rtol=2e-3, atol=2e-4)


def test_root_depth_positive_and_consistent():
    rng = np.random.default_rng(2)
    joints, K = random_hand(rng)
    j25, scale = geometry.convert_to_2_5d(jnp.asarray(K), jnp.asarray(joints))
    z_root, _ = geometry.root_depth(j25, jnp.asarray(K))
    expected = joints[:, PARENT_JOINT, 2] / np.asarray(scale)
    np.testing.assert_allclose(np.asarray(z_root), expected, rtol=5e-3)


def test_opencv_rotation_matrix_matches_cv2():
    cv2 = pytest.importorskip("cv2")
    angle, cx, cy = 33.0, 50.0, 70.0
    ours = np.asarray(
        geometry.opencv_rotation_matrix(
            jnp.asarray([cx]), jnp.asarray([cy]), jnp.asarray([angle])
        )
    )[0]
    theirs = cv2.getRotationMatrix2D((cx, cy), angle, 1.0)
    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-5)


def test_apply_affine_identity():
    pts = jnp.asarray(np.random.default_rng(3).normal(size=(2, 21, 2)).astype(np.float32))
    eye = jnp.broadcast_to(jnp.eye(2, 3), (2, 2, 3))
    out = geometry.apply_affine_2d(pts, eye)
    np.testing.assert_allclose(np.asarray(out), np.asarray(pts), rtol=1e-6)


def test_rotation_round_trip():
    pts = jnp.asarray(np.random.default_rng(4).normal(size=(3, 21, 2)).astype(np.float32))
    ang = jnp.asarray([10.0, -25.0, 100.0])
    fwd = geometry.opencv_rotation_matrix(jnp.zeros(3), jnp.zeros(3), ang)
    bwd = geometry.opencv_rotation_matrix(jnp.zeros(3), jnp.zeros(3), -ang)
    out = geometry.apply_affine_2d(geometry.apply_affine_2d(pts, fwd), bwd)
    np.testing.assert_allclose(np.asarray(out), np.asarray(pts), rtol=1e-4, atol=1e-4)


def test_joint_remaps_roundtrip():
    jm = JointMap()
    x = np.arange(21 * 3, dtype=np.float32).reshape(21, 3)
    for fwd, bwd in [
        (jm.freihand_to_ait, jm.ait_to_freihand),
        (jm.mano_to_ait, jm.ait_to_mano),
    ]:
        np.testing.assert_array_equal(bwd(fwd(x)), x)


def test_freihand_remap_known_indices():
    g = remap_index("freihand", "ait")
    # ait wrist (0) is freihand wrist (0); ait index_mcp (2) is freihand 5.
    assert g[0] == 0
    assert g[2] == 5
    assert g[1] == 1  # thumb_mcp
    assert g[20] == 20  # pinky_tip same in both


def test_crop_box_geometry():
    rng = np.random.default_rng(5)
    joints = rng.uniform(30, 90, size=(2, 21, 2)).astype(np.float32)
    origin, side, rec = geometry.crop_box_from_joints(
        jnp.asarray(joints), 1.25, jnp.zeros((2, 2))
    )
    origin, side, rec = map(np.asarray, (origin, side, rec))
    for b in range(2):
        center = np.trunc(joints[b].mean(axis=0))
        radius = np.trunc(
            np.sqrt(((joints[b] - center) ** 2).sum(-1).max()) * 1.25
        )
        np.testing.assert_allclose(origin[b], np.maximum(center - radius, 0))
        assert side[b] == pytest.approx(2 * radius)
        np.testing.assert_allclose(rec[b], center - radius - origin[b])
