"""MANO / AIK / ShapeNet tests on synthetic MANO parameters (the official
assets are not redistributable; the math is validated structurally:
identity pose == rest pose, rigid equivariance, IK round trips)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from simhand_tpu.finetune.aik import adaptive_ik, axangle2mat
from simhand_tpu.finetune.mano import ManoModel, relative_bone_lengths
from simhand_tpu.finetune.shape_net import ShapeNet, pso_fit_shape, sik_loss
from simhand_tpu.finetune.smoother import OneEuroFilter


def synthetic_mano(seed=0):
    """Small random—but kinematically sane—MANO parameter set."""
    rng = np.random.default_rng(seed)
    n_v = 778
    # skeleton: wrist at origin, 15 joints spread forward
    joints = np.zeros((16, 3))
    parents = np.array([0, 0, 1, 2, 0, 4, 5, 0, 7, 8, 0, 10, 11, 0, 13, 14])
    for j in range(1, 16):
        joints[j] = joints[parents[j]] + rng.uniform(0.02, 0.04, 3)
    # vertices clustered around joints
    assign = rng.integers(0, 16, n_v)
    verts = joints[assign] + rng.normal(scale=0.01, size=(n_v, 3))
    # regressor: averages the verts assigned to each joint
    J_reg = np.zeros((16, n_v))
    for j in range(16):
        members = np.where(assign == j)[0]
        J_reg[j, members] = 1.0 / len(members)
    # force exact joints at rest: adjust template so J_reg @ v == joints
    weights = np.zeros((n_v, 16), np.float32)
    weights[np.arange(n_v), assign] = 1.0
    kintree = np.zeros((2, 16), np.int64)
    kintree[0] = parents
    d = {
        "v_template": verts.astype(np.float32),
        "shapedirs": rng.normal(scale=0.001, size=(n_v, 3, 10)).astype(np.float32),
        "posedirs": rng.normal(scale=0.0001, size=(n_v, 3, 135)).astype(np.float32),
        "J_regressor": J_reg.astype(np.float32),
        "weights": weights,
        "kintree_table": kintree,
    }
    return ManoModel(params=d)


@pytest.fixture(scope="module")
def mano():
    return synthetic_mano()


def identity_pose(b=1):
    return jnp.broadcast_to(jnp.eye(3), (b, 16, 3, 3))


def test_identity_pose_reproduces_rest(mano):
    beta = jnp.zeros((1, 10))
    verts, joints21 = mano(identity_pose(), beta)
    rest_joints = mano.shaped_joints(beta)
    np.testing.assert_allclose(
        np.asarray(joints21[:, :16]), np.asarray(rest_joints), atol=2e-4
    )
    # zero pose blend: verts == template (+ shape blend of zero beta)
    np.testing.assert_allclose(
        np.asarray(verts[0]), np.asarray(mano.v_template), atol=2e-4
    )


def test_global_rotation_equivariance(mano):
    beta = jnp.zeros((1, 10))
    R = jnp.asarray(axangle2mat(np.array([0.0, 0.0, 1.0]), 0.7), jnp.float32)
    pose = identity_pose().at[:, 0].set(R)
    verts_rot, joints_rot = mano(pose, beta)
    verts_id, joints_id = mano(identity_pose(), beta)
    # wrist (joint 0) pivot is the origin of the rotation
    pivot = np.asarray(joints_id[0, 0])
    want = (np.asarray(joints_id[0]) - pivot) @ np.asarray(R).T + pivot
    np.testing.assert_allclose(np.asarray(joints_rot[0]), want, atol=1e-3)


def test_relative_bone_lengths_shape_and_ref_norm(mano):
    beta = jnp.zeros((2, 10))
    bl = relative_bone_lengths(mano, beta)
    assert bl.shape == (2, 15)
    assert np.all(np.asarray(bl) > 0)


def test_aik_roundtrip_on_mano_skeleton(mano):
    """IK(FK(pose)) reproduces the posed joints through MANO. adaptive_ik
    operates in freihand/snap order (its SNAP_PARENT/ID2ROT tables)."""
    from simhand_tpu.core.joints import JointMap

    jm = JointMap()
    beta = jnp.zeros((1, 10))
    _, template21 = mano(identity_pose(), beta)
    template_fh = jm.mano_to_freihand(np.asarray(template21[0]))

    rng = np.random.default_rng(3)
    # random-ish global rotation only (swing-only IK is exact there)
    R = axangle2mat(rng.normal(size=3), 0.5)
    pose = identity_pose().at[:, 0].set(jnp.asarray(R, jnp.float32))
    _, target = mano(pose, beta)
    target = np.asarray(target[0])

    pose_rec = adaptive_ik(template_fh, jm.mano_to_freihand(target))
    _, rec = mano(jnp.asarray(pose_rec, jnp.float32), beta)
    np.testing.assert_allclose(np.asarray(rec[0]), target, atol=5e-3)


def test_aik_tracks_articulated_pose_in_snap_order(mano):
    """Discriminative order check: an ARTICULATED pose (bent finger, not
    just a rigid rotation) reconstructs accurately only when the IK sees
    snap-ordered joints — MANO-native ordering scrambles SNAP_PARENT and
    degrades reconstruction by >10x."""
    from simhand_tpu.core.joints import JointMap

    jm = JointMap()
    beta = jnp.zeros((1, 10))
    _, t21 = mano(identity_pose(), beta)
    template_fh = jm.mano_to_freihand(np.asarray(t21[0]))

    # bend the index finger (MANO pose slots 1-3) + a global rotation
    R = axangle2mat(np.array([0.1, 0.9, 0.2]), 0.4)
    bend = axangle2mat(np.array([1.0, 0.0, 0.0]), 0.5)
    pose = identity_pose().at[:, 0].set(jnp.asarray(R, jnp.float32))
    pose = pose.at[:, 1].set(jnp.asarray(bend, jnp.float32))
    _, target = mano(pose, beta)
    target = np.asarray(target[0])
    scale = np.linalg.norm(
        np.asarray(t21[0])[9] - np.asarray(t21[0])[0]
    )

    def recon_err(order_fn):
        pose_rec = adaptive_ik(order_fn(np.asarray(t21[0])),
                               order_fn(target))
        _, rec = mano(jnp.asarray(pose_rec, jnp.float32), beta)
        return np.abs(np.asarray(rec[0]) - target).mean() / scale

    err_snap = recon_err(jm.mano_to_freihand)
    err_mano = recon_err(lambda x: x)
    assert err_snap < 0.1, err_snap
    assert err_mano > 3 * err_snap, (err_mano, err_snap)


def test_axangle2mat_is_rotation():
    R = axangle2mat(np.array([1.0, 2.0, 3.0]), 1.1)
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-10)
    assert np.linalg.det(R) == pytest.approx(1.0)


def test_shape_net_forward_and_loss(mano):
    model = ShapeNet()
    bones = jnp.ones((4, 15)) * 0.5
    variables = model.init(jax.random.key(0), bones)
    beta = model.apply(variables, bones)
    assert beta.shape == (4, 10)
    assert np.all(np.abs(np.asarray(beta)) <= 1.0)  # tanh bound
    loss, bone_hat = sik_loss(mano, beta, bones)
    assert np.isfinite(float(loss))
    assert bone_hat.shape == (4, 15)


def test_pso_fits_known_shape(mano):
    rng = np.random.default_rng(5)
    beta_true = rng.uniform(-1, 1, 10).astype(np.float32)
    target = np.asarray(relative_bone_lengths(mano, jnp.asarray(beta_true)[None]))[0]
    beta_fit = pso_fit_shape(mano, target, n_particles=60, n_iters=25, seed=1)
    got = np.asarray(relative_bone_lengths(mano, jnp.asarray(beta_fit)[None]))[0]
    assert np.abs(got - target).max() < 0.05


def test_one_euro_filter_smooths():
    f = OneEuroFilter(mincutoff=1.0, beta=0.0, freq=30.0)
    rng = np.random.default_rng(6)
    signal = np.sin(np.linspace(0, 4, 120)) + 0.2 * rng.standard_normal(120)
    smooth = np.array([f.process(np.array([s]))[0] for s in signal])
    assert np.var(np.diff(smooth)) < np.var(np.diff(signal))


def test_lm_fit_recovers_shape(mano):
    from simhand_tpu.finetune.lm_fit import align_bone_len, lm_fit_shape
    from simhand_tpu.finetune.mano import relative_bone_lengths
    import jax.numpy as jnp

    rng = np.random.default_rng(11)
    beta_true = rng.uniform(-1, 1, 10).astype(np.float32)
    target = np.asarray(
        relative_bone_lengths(mano, jnp.asarray(beta_true)[None])
    )[0]
    beta_fit, cost = lm_fit_shape(mano, target, n_iters=25)
    got = np.asarray(relative_bone_lengths(mano, jnp.asarray(beta_fit)[None]))[0]
    assert align_bone_len(got, target) < 0.02
    assert cost < 1e-2


def test_reconstruct_joints_close_to_prediction(mano):
    """AIK+MANO reconstruction approximates the input joints (global
    rotation case is exact; bent fingers approximate)."""
    import jax.numpy as jnp

    from simhand_tpu.core.joints import JointMap
    from simhand_tpu.finetune.aik import axangle2mat
    from simhand_tpu.finetune.recon import reconstruct

    jm = JointMap()
    beta = jnp.zeros((1, 10))
    R = axangle2mat(np.array([0.2, 1.0, 0.1]), 0.6)
    pose = jnp.broadcast_to(jnp.eye(3), (1, 16, 3, 3)).at[:, 0].set(
        jnp.asarray(R, jnp.float32)
    )
    _, target21 = mano(pose, beta)
    target_fh = jm.mano_to_freihand(np.asarray(target21[0]))

    _, rec21, _, _ = reconstruct(mano, target_fh, beta=np.zeros(10))
    # compare bone-normalized shapes
    t = np.asarray(target21[0]); r = rec21
    t = (t - t[0]) / (np.linalg.norm(t[4] - t[0]) + 1e-9)
    r = (r - r[0]) / (np.linalg.norm(r[4] - r[0]) + 1e-9)
    assert np.abs(t - r).max() < 0.2


def test_sik1m_dataset_roundtrip(mano, tmp_path):
    """create_sik1m_data writes the npy pair; SIK1M splits 80/20 and adds
    the reference's per-bone noise on fetch
    (reference: minimal-hand/datasets/SIK1M.py, create_data.py)."""
    from simhand_tpu.finetune.datasets import SIK1M, SIK1M_NOISE, create_sik1m_data

    create_sik1m_data(mano, 50, str(tmp_path), batch=16, seed=0)
    bones = np.load(tmp_path / "data_bone.npy")
    shapes = np.load(tmp_path / "data_shape.npy")
    assert bones.shape == (50, 15) and shapes.shape == (50, 10)
    # stored bone lengths really are the MANO bone lengths of the betas
    expect = np.asarray(relative_bone_lengths(mano, jnp.asarray(shapes[:4])))
    np.testing.assert_allclose(bones[:4], expect, atol=1e-5)

    train = SIK1M(str(tmp_path), "train", seed=1)
    test = SIK1M(str(tmp_path), "test", seed=1)
    assert len(train) == 40 and len(test) == 10
    s = train[0]
    assert s["shape"].shape == (10,) and s["rel_bone_len"].shape == (15,)
    # noise is bounded by a few sigma of the reference vector; bone 6 exact
    diff = np.abs(s["rel_bone_len"] - bones[0])
    assert diff[6] == 0.0
    assert (diff[SIK1M_NOISE > 0] < 6 * SIK1M_NOISE[SIK1M_NOISE > 0]).all()


def test_train_shape_net_from_sik1m(mano, tmp_path, monkeypatch):
    """--data_root path trains from the npy dataset."""
    import simhand_tpu.finetune.mano as mano_mod
    from simhand_tpu.finetune.datasets import create_sik1m_data
    from simhand_tpu.finetune.train_shape_net import main as tsn_main

    create_sik1m_data(mano, 64, str(tmp_path / "sik"), batch=32, seed=0)
    monkeypatch.setattr(mano_mod, "ManoModel", lambda path: mano)
    params = tsn_main([
        "--mano", "unused", "--steps", "3", "--batch_size", "8",
        "--data_root", str(tmp_path / "sik"),
    ])
    assert params is not None


def test_optimize_shape_cli(mano, monkeypatch, capsys):
    """The batch shape-fitting comparison driver runs end to end."""
    import simhand_tpu.finetune.mano as mano_mod
    from simhand_tpu.finetune.optimize_shape import main as opt_main

    monkeypatch.setattr(mano_mod, "ManoModel", lambda path: mano)
    opt_main(["--mano", "unused", "--n", "2"])
    out = capsys.readouterr().out
    assert "PSO" in out and "LM" in out


def test_demo_cli_on_synthetic_video(mano, monkeypatch, tmp_path):
    """demo.py consumes a tiny synthetic video, overlays skeletons, writes
    the annotated output (untrained detnet — output content is arbitrary
    but the pipeline must run)."""
    import cv2

    import simhand_tpu.finetune.mano as mano_mod
    from simhand_tpu.finetune.demo import main as demo_main

    vid = str(tmp_path / "in.mp4")
    w = cv2.VideoWriter(vid, cv2.VideoWriter_fourcc(*"mp4v"), 10, (160, 120))
    rng = np.random.default_rng(0)
    for _ in range(3):
        w.write(rng.integers(0, 255, (120, 160, 3), dtype=np.uint8))
    w.release()

    monkeypatch.setattr(mano_mod, "ManoModel", lambda path: mano)
    out = str(tmp_path / "out.mp4")
    demo_main(["--video", vid, "--backbone", "18", "--max_frames", "2",
               "--out", out, "--mano", "unused"])
    cap = cv2.VideoCapture(out)
    ok, frame = cap.read()
    cap.release()
    # center-cropped square frame + the MANO wireframe side panel
    assert ok and frame.shape == (120, 240, 3)
    assert frame[:, 120:].any()  # the mesh panel is drawn


@pytest.mark.slow
def test_demo_cli_shape_net_route(mano, monkeypatch, tmp_path):
    """--shape_net switches the demo to the demo_dl.py route: per-frame
    ShapeNet shape regression (One-Euro smoothed) instead of the one-shot
    PSO fit."""
    import cv2
    import jax
    import jax.numpy as jnp
    from flax import serialization

    import simhand_tpu.finetune.mano as mano_mod
    from simhand_tpu.finetune.demo import main as demo_main
    from simhand_tpu.finetune.shape_net import ShapeNet

    vid = str(tmp_path / "in.mp4")
    w = cv2.VideoWriter(vid, cv2.VideoWriter_fourcc(*"mp4v"), 10, (160, 120))
    rng = np.random.default_rng(1)
    for _ in range(3):
        w.write(rng.integers(0, 255, (120, 160, 3), dtype=np.uint8))
    w.release()

    model = ShapeNet()
    params = model.init(jax.random.key(0), jnp.zeros((1, 15)))["params"]
    sn_path = str(tmp_path / "sn.msgpack")
    with open(sn_path, "wb") as f:
        f.write(serialization.to_bytes(params))

    monkeypatch.setattr(mano_mod, "ManoModel", lambda path: mano)
    out = str(tmp_path / "out.mp4")
    demo_main(["--video", vid, "--backbone", "18", "--max_frames", "2",
               "--out", out, "--mano", "unused", "--shape_net", sn_path])
    cap = cv2.VideoCapture(out)
    ok, frame = cap.read()
    cap.release()
    assert ok and frame.shape == (120, 240, 3)
    assert frame[:, 120:].any()


def test_dl_shape_estimate_cli(mano, monkeypatch, tmp_path, capsys):
    """--pre_joints runs the dl_shape_estimate regression: joints ->
    cal_ref_bone -> ShapeNet betas saved + ratio-aligned error printed."""
    import jax
    import jax.numpy as jnp
    from flax import serialization

    import simhand_tpu.finetune.mano as mano_mod
    from simhand_tpu.finetune.optimize_shape import main as opt_main
    from simhand_tpu.finetune.shape_net import ShapeNet

    # random ShapeNet params on disk
    model = ShapeNet()
    params = model.init(jax.random.key(0), jnp.zeros((1, 15)))["params"]
    sn_path = str(tmp_path / "sn.msgpack")
    with open(sn_path, "wb") as f:
        f.write(serialization.to_bytes(params))

    # predicted joints: MANO rest skeleton mapped to 21 freihand slots
    from simhand_tpu.core.joints import JointMap
    jm = JointMap()
    beta = jnp.zeros((1, 10))
    _, j21 = mano(jnp.broadcast_to(jnp.eye(3), (1, 16, 3, 3)), beta)
    pre = jm.mano_to_freihand(np.asarray(j21))
    jpath = str(tmp_path / "pre.npy")
    np.save(jpath, np.repeat(pre, 3, axis=0))

    monkeypatch.setattr(mano_mod, "ManoModel", lambda path: mano)
    out_beta = str(tmp_path / "dl.npy")
    opt_main(["--mano", "unused", "--shapenet", sn_path,
              "--pre_joints", jpath, "--out_beta", out_beta])
    out = capsys.readouterr().out
    assert "dl regression error" in out
    assert np.load(out_beta).shape == (3, 10)


def test_ref_bones_from_joints_matches_mano_bones(mano):
    """cal_ref_bone on the MANO rest skeleton's 21 joints reproduces
    new_cal_ref_bone's normalized bone lengths (same chain order)."""
    import jax.numpy as jnp

    from simhand_tpu.core.joints import JointMap
    from simhand_tpu.finetune.lm_fit import ref_bones_from_joints
    from simhand_tpu.finetune.mano import relative_bone_lengths

    jm = JointMap()
    beta = jnp.zeros((2, 10))
    _, j21 = mano(jnp.broadcast_to(jnp.eye(3), (2, 16, 3, 3)), beta)
    pre = jm.mano_to_freihand(np.asarray(j21))
    got = ref_bones_from_joints(pre)
    want = np.asarray(relative_bone_lengths(mano, beta))
    # same skeleton measured through two code paths: identical up to the
    # tip-vertex-vs-regressor difference (tips are excluded from bones)
    np.testing.assert_allclose(got, want, rtol=5e-2, atol=5e-3)


def test_software_mesh_renderer():
    """finetune/render.py: shading varies with the light (Lambert), the
    silhouette is filled, occlusion follows depth order, and the view
    matrix orbits the silhouette."""
    import numpy as np

    from simhand_tpu.finetune.render import (
        render_mesh_shaded,
        vertex_normals,
        view_matrix,
    )

    # tetrahedron
    verts = np.array([
        [0.0, 0.0, 0.0], [1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0],
    ])
    faces = np.array([[0, 2, 1], [0, 1, 3], [0, 3, 2], [1, 2, 3]])

    vn = vertex_normals(verts, faces)
    np.testing.assert_allclose(np.linalg.norm(vn, axis=1), 1.0, rtol=1e-9)

    img = render_mesh_shaded(verts, faces, 96)
    assert img.shape == (96, 96, 3) and img.dtype == np.uint8
    body = img[img[..., 0] != img[0, 0, 0]]
    assert body.size > 500                     # silhouette filled
    assert len(np.unique(body[:, 0])) > 1      # shading varies by face

    # orbiting 90 degrees changes the image
    img90 = render_mesh_shaded(verts, faces, 96, azimuth_deg=90)
    assert (img != img90).any()

    # view_matrix is a rotation
    R = view_matrix(33, -20)
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-12)
    assert np.isclose(np.linalg.det(R), 1.0)
