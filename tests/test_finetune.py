import jax
import jax.numpy as jnp
import numpy as np
import pytest

from simhand_tpu.finetune.datasets import (
    DetnetSampleBuilder,
    SyntheticPoseDataset,
    detnet_batch_iterator,
    get_affine_transform,
    transform_coords,
)
from simhand_tpu.finetune.detloss import det_loss
from simhand_tpu.finetune.detnet import DetNet, gather_at_argmax, map_to_uv, pose_tile
from simhand_tpu.finetune.evaluation import (
    EvalUtil,
    auc_joints,
    epe_statistics,
    pck_curve,
    procrustes_align,
)
from simhand_tpu.finetune.maps import gen_heatmaps, joint_maps, SNAP_PARENT


def test_pose_tile_matches_reference_layout():
    t = np.asarray(pose_tile(2, 32))
    assert t.shape == (2, 32, 32, 2)
    # ch0 varies across width, ch1 across height, both -1..1
    np.testing.assert_allclose(t[0, 0, :, 0], np.linspace(-1, 1, 32), rtol=1e-6)
    np.testing.assert_allclose(t[0, :, 0, 1], np.linspace(-1, 1, 32), rtol=1e-6)


def test_map_to_uv_and_gather():
    rng = np.random.default_rng(0)
    hmap = jnp.asarray(rng.uniform(size=(2, 32, 32, 21)).astype(np.float32))
    uv, onehot = map_to_uv(hmap)
    h = np.asarray(hmap)
    for b in range(2):
        for j in range(21):
            idx = h[b, :, :, j].reshape(-1).argmax()
            assert uv[b, j, 0] == idx // 32 and uv[b, j, 1] == idx % 32
    vmap = jnp.asarray(rng.normal(size=(2, 32, 32, 21, 3)).astype(np.float32))
    got = np.asarray(gather_at_argmax(vmap, onehot))
    v = np.asarray(vmap)
    for b in range(2):
        for j in range(21):
            idx = h[b, :, :, j].reshape(-1).argmax()
            r, c = idx // 32, idx % 32
            np.testing.assert_allclose(got[b, j], v[b, r, c, j], rtol=1e-6)


def test_detnet_shapes():
    model = DetNet(resnet_size="50")
    x = jnp.zeros((2, 128, 128, 3))
    variables = model.init(jax.random.key(0), x)
    out = model.apply(variables, x)
    assert out["h_map"].shape == (2, 32, 32, 21)
    assert out["d_map"].shape == (2, 32, 32, 21, 3)
    assert out["l_map"].shape == (2, 32, 32, 21, 3)
    assert out["xyz"].shape == (2, 21, 3)
    assert out["uv"].shape == (2, 21, 2)


def test_heatmap_generation_matches_reference_semantics():
    hm, veil = gen_heatmaps(np.array([[64.0, 64.0]] * 21, np.float32), 128, 32, 1.0)
    assert hm.shape == (32, 32, 21) and veil.shape == (21,)
    assert veil.all()
    # peak at the scaled coord (64/128*32 = 16)
    assert hm[16, 16, 0] == pytest.approx(1.0)
    # out-of-bounds keypoint -> zero map, veil 0
    hm2, veil2 = gen_heatmaps(np.array([[500.0, 500.0]] * 21, np.float32), 128, 32)
    assert not veil2.any() and hm2.sum() == 0


def test_joint_maps_normalization():
    rng = np.random.default_rng(1)
    joint = rng.normal(size=(21, 3)).astype(np.float64)
    loc, delta, root, bone = joint_maps(joint, 32)
    assert loc.shape == (32, 32, 21, 3)
    # rooted at the WRIST (reference handataset.py:81,336)
    np.testing.assert_allclose(root, joint[0])
    np.testing.assert_allclose(bone, np.linalg.norm(joint[9] - joint[0]), rtol=1e-6)
    # location map reproduces normalized joints at every pixel
    want = (joint - joint[0]) / bone
    np.testing.assert_allclose(loc[0, 0], want, rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(loc[31, 31], want, rtol=1e-4, atol=1e-6)
    # delta vectors are unit length (except root)
    norms = np.linalg.norm(delta[0, 0], axis=-1)
    np.testing.assert_allclose(norms[1:], 1.0, rtol=1e-4)
    # kinematic chain directions
    for i in range(1, 21):
        d = want[i] - want[SNAP_PARENT[i]]
        np.testing.assert_allclose(
            delta[0, 0, i], d / np.linalg.norm(d), rtol=1e-4, atol=1e-5
        )


def test_det_loss_runs_and_masks_2d_only():
    rng = np.random.default_rng(2)
    n = 4
    preds = {
        "h_map": jnp.asarray(rng.uniform(size=(n, 32, 32, 21)).astype(np.float32)),
        "d_map": jnp.asarray(rng.normal(size=(n, 32, 32, 21, 3)).astype(np.float32)),
        "l_map": jnp.asarray(rng.normal(size=(n, 32, 32, 21, 3)).astype(np.float32)),
    }
    hm = jnp.asarray(rng.uniform(size=(n, 32, 32, 21)).astype(np.float32))
    dm = jnp.asarray(rng.normal(size=(n, 32, 32, 21, 3)).astype(np.float32))
    lm = jnp.asarray(rng.normal(size=(n, 32, 32, 21, 3)).astype(np.float32))
    veil = jnp.ones((n, 21), jnp.float32)

    total_all, parts_all = det_loss(preds, hm, dm, lm, veil, jnp.ones(n))
    total_none, parts_none = det_loss(preds, hm, dm, lm, veil, jnp.zeros(n))
    assert float(parts_none["det_dm"]) == 0.0
    assert float(parts_none["det_lm"]) == 0.0
    assert float(parts_all["det_dm"]) > 0
    assert float(parts_all["det_hm"]) == pytest.approx(
        float(parts_none["det_hm"])
    )


def test_affine_transform_round_trip():
    center = np.array([100.0, 120.0])
    affine, _ = get_affine_transform(center, 200.0, [128, 128], rot=0.3)
    pts = np.array([[100.0, 120.0], [150.0, 120.0]])
    out = transform_coords(pts, affine)
    # center maps to image center
    np.testing.assert_allclose(out[0], [64.0, 64.0], atol=1e-4)
    # distances scale by res/scale
    d = np.linalg.norm(out[1] - out[0])
    assert d == pytest.approx(50.0 * 128 / 200.0, rel=1e-5)


def test_sample_builder_and_batching():
    ds = SyntheticPoseDataset(n=8)
    builder = DetnetSampleBuilder(train=True)
    batch = next(detnet_batch_iterator(ds, builder, batch_size=4, epoch=0))
    assert batch["img"].shape == (4, 128, 128, 3)
    assert batch["hm"].shape == (4, 32, 32, 21)
    assert batch["dm"].shape == (4, 32, 32, 21, 3)
    assert batch["flag_3d"].all()
    assert batch["img"].min() >= -0.5 - 1e-6 and batch["img"].max() <= 0.5 + 1e-6


def test_evalutil_matches_reference_contract():
    rng = np.random.default_rng(3)
    gt = rng.normal(size=(10, 21, 3))
    pred = gt + rng.normal(scale=0.01, size=(10, 21, 3))
    ev = EvalUtil()
    for i in range(10):
        ev.feed(gt[i], pred[i])
    epe_mean, per_joint, epe_median, auc, curve, thr = ev.get_measures(0, 0.05, 20)
    d = np.linalg.norm(gt - pred, axis=-1)
    assert epe_mean == pytest.approx(d.mean(axis=0).mean(), rel=1e-6)
    assert len(per_joint) == 21
    assert 0.0 < auc <= 1.0
    assert curve.shape == (20,)


def test_pck_auc_match_manual():
    rng = np.random.default_rng(4)
    d = np.abs(rng.normal(scale=0.1, size=(50, 21)))
    curve, thr = pck_curve(d)
    assert curve.shape == (100,)
    t10 = thr[10]
    assert curve[10] == pytest.approx((d < t10).mean())
    a = auc_joints(d, per_joint=False)
    assert 0 < a < 1


def test_procrustes_recovers_similarity_transform():
    rng = np.random.default_rng(5)
    X = rng.normal(size=(3, 21, 3)).astype(np.float32)
    # random rotation via QR
    Q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
    if np.linalg.det(Q) < 0:
        Q[:, 0] *= -1
    Y = 0.5 * X @ Q.T + rng.normal(size=(1, 1, 3)).astype(np.float32)
    Y_aligned, R, scale, t = procrustes_align(jnp.asarray(X), jnp.asarray(Y))
    np.testing.assert_allclose(np.asarray(Y_aligned), X, rtol=1e-3, atol=1e-4)


def test_epe_statistics():
    gt = np.zeros((5, 21, 3))
    pred = np.ones((5, 21, 3)) * np.array([3, 4, 0]) / 5  # dist 1 each
    s = epe_statistics(pred, gt)
    assert s["mean"] == pytest.approx(1.0)


def test_rn25d_head_forward():
    from simhand_tpu.models.heads import RN25DWithMLPRef

    model = RN25DWithMLPRef(resnet_size="50")
    img = jnp.zeros((2, 128, 128, 3))
    variables = model.init(jax.random.key(0), img)
    out = model.apply(variables, img)
    assert out["kp3d"].shape == (2, 21, 3)
    assert out["kp25d"].shape == (2, 21, 3)
    # root's relative depth forced to zero — in the kp25d output too
    # (the reference's in-place zrel[:, 0] = 0 mutates the aliased view)
    np.testing.assert_allclose(np.asarray(out["zrel"][:, 0, 0]), 0.0)
    np.testing.assert_allclose(np.asarray(out["kp25d"][:, 0, 2]), 0.0)
    np.testing.assert_allclose(
        np.asarray(out["kp25d"][..., :2]), np.asarray(out["kp2d"])
    )


def test_evaluate_25d_on_perfect_predictions():
    """Feeding ground-truth 2.5D as predictions must give ~0 EPE."""
    from simhand_tpu.core import geometry
    from simhand_tpu.experiments.evaluation import evaluate_25d

    rng = np.random.default_rng(7)
    B = 8
    joints = rng.uniform(-0.05, 0.05, (B, 21, 3)).astype(np.float32)
    joints[..., 2] += 0.6
    K = np.broadcast_to(
        np.array([[480.0, 0, 112], [0, 480.0, 112], [0, 0, 1]], np.float32),
        (B, 3, 3),
    ).copy()
    j25, scale = geometry.convert_to_2_5d(jnp.asarray(K), jnp.asarray(joints))
    batch = {
        "image": np.zeros((B, 8, 8, 3), np.float32),
        "joints": np.asarray(j25),
        "joints3D": joints,
        "K": K,
        "scale": np.asarray(scale),
        "joints_raw": joints,
    }
    metrics = evaluate_25d(lambda img: np.asarray(j25), [batch])
    assert metrics["Mean_EPE_2D"] < 1e-3
    assert metrics["Mean_EPE_3D"] < 1e-3
    assert metrics["auc"] > 0.99
    assert metrics["Mean_EPE_3D_procrustes"] < 1e-3


def test_supervised_prep_pipeline():
    from simhand_tpu.data.augment_cv2 import AugmentFlags, AugmentParams
    from simhand_tpu.data.pipeline import PretrainDataset

    class _SupSource:
        def __len__(self):
            return 4

        def __getitem__(self, i):
            rng = np.random.default_rng(i)
            j3d = rng.uniform(-0.05, 0.05, (21, 3)).astype(np.float32)
            j3d[:, 2] += 0.6
            K = np.array([[480.0, 0, 112], [0, 480.0, 112], [0, 0, 1]], np.float32)
            return {
                "image": rng.integers(0, 255, (224, 224, 3), dtype=np.uint8),
                "image_name": f"s{i}",
                "K": K,
                "joints3D": j3d,
                "joints_valid": np.ones((21, 1), np.float32),
                "joints_raw": j3d.copy(),
            }

    ds = PretrainDataset(
        _SupSource(), "supervised",
        AugmentFlags(crop=True, resize=True, rotate=True), AugmentParams(),
    )
    s = ds.__getitem__(0)
    assert s["image"].shape == (128, 128, 3)
    assert s["joints"].shape == (21, 3)
    assert s["K"].shape == (3, 3)
    # recreated 3D should be consistent with the (augmented) 2.5D + new K
    assert np.isfinite(s["joints3D_recreated"]).all()


def test_crop_and_resize_via_joints_updates_K():
    from simhand_tpu.data.crops import crop_and_resize_via_joints

    rng = np.random.default_rng(9)
    img = rng.integers(0, 255, (480, 640, 3), dtype=np.uint8)
    K = np.array([[600.0, 0, 320], [0, 600.0, 240], [0, 0, 1]], np.float32)
    xyz = rng.uniform(-0.05, 0.05, (21, 3)).astype(np.float32)
    xyz[:, 2] += 0.5
    uvw = (K @ xyz.T).T
    kp2d = uvw[:, :2] / uvw[:, 2:]

    crop, kp_new, K_new = crop_and_resize_via_joints(img, kp2d, 224, 1.5, K)
    assert crop.shape == (224, 224, 3)
    # reprojecting the 3D joints with the updated K lands on the new kp2d
    uvw2 = (K_new @ xyz.T).T
    kp_reproj = uvw2[:, :2] / uvw2[:, 2:]
    np.testing.assert_allclose(kp_reproj, kp_new, atol=1.5)
    assert kp_new.min() >= -5 and kp_new.max() <= 229


def test_uvd_xyz_roundtrip():
    """xyz2uvd/uvd2xyz invert each other and match the reference depth
    window (reference: minimal-hand/utils/handutils.py:95-176)."""
    from simhand_tpu.finetune.maps import DEPTH_MIN, DEPTH_RANGE, uvd2xyz, xyz2uvd

    rng = np.random.default_rng(0)
    B, J = 3, 21
    xyz = rng.uniform(-0.1, 0.1, (B, J, 3)).astype(np.float32)
    xyz[..., 2] += 0.6
    root = xyz[:, 9]
    bone = np.linalg.norm(xyz[:, 9] - xyz[:, 0], axis=-1)
    intr = np.tile(np.array(
        [[400.0, 0, 128], [0, 400.0, 128], [0, 0, 1]], np.float32), (B, 1, 1))

    uvd = np.asarray(xyz2uvd(xyz, root, bone, intr))
    # root depth encodes to the middle of the window
    np.testing.assert_allclose(
        uvd[:, 9, 2], (0.0 - DEPTH_MIN) / DEPTH_RANGE, atol=1e-6)
    back = np.asarray(uvd2xyz(uvd, root, bone, intr))
    np.testing.assert_allclose(back, xyz, atol=1e-5)


@pytest.mark.slow
def test_detnet_sharded_step_runs_on_mesh():
    """The detnet train step jits and runs over the 8-device mesh
    (per-replica BN, pmean'd grads)."""
    import jax
    import jax.numpy as jnp
    import optax

    from simhand_tpu.finetune.detnet import DetNet
    from simhand_tpu.finetune.train import make_detnet_train_step
    from simhand_tpu.parallel import create_mesh
    from simhand_tpu.parallel.mesh import replicate, shard_batch
    from simhand_tpu.train.state import TrainState

    mesh = create_mesh()
    n_dev = mesh.devices.size
    model = DetNet(resnet_size="18")
    variables = model.init(jax.random.key(0), jnp.zeros((1, 128, 128, 3)))
    state = TrainState.create(
        apply_fn=model.apply, params=variables["params"],
        tx=optax.adam(1e-4), batch_stats=variables["batch_stats"],
    )
    state = replicate(mesh, state)

    rng = np.random.default_rng(0)
    B = 2 * n_dev
    batch = {
        "img": rng.normal(size=(B, 128, 128, 3)).astype(np.float32),
        "hm": rng.uniform(0, 1, (B, 32, 32, 21)).astype(np.float32),
        "dm": rng.normal(size=(B, 32, 32, 21, 3)).astype(np.float32),
        "lm": rng.normal(size=(B, 32, 32, 21, 3)).astype(np.float32),
        "hm_veil": np.ones((B, 21), np.float32),
        "flag_3d": np.ones((B,), np.float32),
    }
    batch = shard_batch(mesh, batch)
    step = make_detnet_train_step(model, mesh=mesh)
    # snapshot BEFORE stepping: the step donates the input state
    p0 = np.asarray(jax.tree.leaves(state.params)[0])
    new_state, parts = step(state, batch)
    for v in parts.values():
        assert np.isfinite(float(v))
    # params actually moved
    p1 = jax.tree.leaves(new_state.params)[0]
    assert not np.allclose(p0, np.asarray(p1))


def test_det_loss_mesh_matches_single_device():
    """Sharded det_loss == single-device det_loss on the same global
    batch: values exact (psum'd sqrt-of-sum norms — per-shard norms
    would be ~sqrt(world) larger), and per-shard grads are world x the
    single-device per-sample grads (psum transpose + local-mean
    denominators), so the trainer's pmean recovers the exact
    single-device gradient."""
    import jax
    from jax import shard_map
    from jax.sharding import Mesh, PartitionSpec as P

    from simhand_tpu.finetune.detloss import det_loss

    rng = np.random.default_rng(2)
    B, R, J = 16, 8, 21
    preds = {
        "h_map": jnp.asarray(rng.uniform(0, 1, (B, R, R, J)), jnp.float32),
        "d_map": jnp.asarray(rng.normal(size=(B, R, R, J, 3)), jnp.float32),
        "l_map": jnp.asarray(rng.normal(size=(B, R, R, J, 3)), jnp.float32),
    }
    hm = jnp.asarray(rng.uniform(0, 1, (B, R, R, J)), jnp.float32)
    dm = jnp.asarray(rng.normal(size=(B, R, R, J, 3)), jnp.float32)
    lm = jnp.asarray(rng.normal(size=(B, R, R, J, 3)), jnp.float32)
    veil = jnp.asarray(rng.integers(0, 2, (B, J)), jnp.float32)
    flag = jnp.asarray(rng.integers(0, 2, B), jnp.float32)

    lfg_s, parts_s = det_loss(preds, hm, dm, lm, veil, flag)
    grad_s = jax.grad(
        lambda p: det_loss(p, hm, dm, lm, veil, flag)[0]
    )(preds)

    mesh = Mesh(np.array(jax.devices()), ("data",))
    world = len(jax.devices())

    def f(p, hm, dm, lm, veil, flag):
        lfg, parts = det_loss(p, hm, dm, lm, veil, flag, axis_name="data")
        g = jax.grad(
            lambda pp: det_loss(pp, hm, dm, lm, veil, flag,
                                axis_name="data")[0]
        )(p)
        parts = jax.tree.map(lambda x: jax.lax.pmean(x, "data"), parts)
        return parts, g

    sharded = jax.jit(shard_map(
        f, mesh=mesh,
        in_specs=(P("data"),) * 6,
        out_specs=(P(), P("data")),
        check_vma=False,
    ))
    parts_m, grad_m = sharded(preds, hm, dm, lm, veil, flag)

    for k in ("det_hm", "det_dm", "det_lm", "det_total"):
        assert float(parts_m[k]) == pytest.approx(float(parts_s[k]),
                                                  rel=1e-5), k
    # per-sample preds-grads of the global objective carry a world
    # factor that the trainer's pmean-over-param-grads divides back out
    for k in grad_s:
        np.testing.assert_allclose(
            np.asarray(grad_m[k]), world * np.asarray(grad_s[k]),
            rtol=1e-5, atol=1e-7,
        )


def test_heatmap_pck_reference_protocol():
    """accuracy_heatmap semantics (evalutils.py:29-76): per-joint macro
    average over joints with >=1 valid sample; sample-joints with GT
    argmax row/col < 1 excluded; norm = W/10."""
    from simhand_tpu.finetune.evaluation import heatmap_pck

    B, H, W, J = 4, 32, 32, 3
    gt = np.zeros((B, H, W, J), np.float32)
    pred = np.zeros((B, H, W, J), np.float32)
    veil = np.ones((B, J), np.float32)
    # joint 0: all 4 samples correct (pred == gt peak at (10, 10))
    gt[:, 10, 10, 0] = 1.0
    pred[:, 10, 10, 0] = 1.0
    # joint 1: 1 of 2 valid samples within thr (norm = 3.2, thr 0.5 ->
    # 1.6 px); samples 2-3 veiled out
    gt[:, 20, 20, 1] = 1.0
    pred[0, 20, 21, 1] = 1.0          # dist 1 / 3.2  < 0.5  -> hit
    pred[1, 20, 28, 1] = 1.0          # dist 8 / 3.2  > 0.5  -> miss
    veil[2:, 1] = 0.0
    pred[2:, 20, 20, 1] = 1.0         # would be hits, but veiled
    # joint 2: GT argmax at the border (row 0) -> excluded entirely
    gt[:, 0, 5, 2] = 1.0
    pred[:, 0, 5, 2] = 1.0

    got = heatmap_pck(pred, gt, veil)
    # macro average over joints 0 (acc 1.0) and 1 (acc 0.5); joint 2
    # contributes nothing
    assert got == pytest.approx((1.0 + 0.5) / 2)


def test_heatmap_metrics_non_degenerate():
    """heatmap_metrics keeps two extra signals informative where the
    strict PCK reads 0.0 (round-4 VERDICT #4: all-zero metric columns at
    miniature budgets): hm_pck_loose is non-zero even for random argmax
    placement, hm_dist is continuous, and hm_pck matches heatmap_pck
    exactly."""
    from simhand_tpu.finetune.evaluation import heatmap_metrics, heatmap_pck

    rng = np.random.default_rng(0)
    B, H, W, J = 8, 32, 32, 21
    gt = np.zeros((B, H, W, J), np.float32)
    for b in range(B):
        for j in range(J):
            gt[b, rng.integers(2, 30), rng.integers(2, 30), j] = 1.0
    pred = rng.normal(size=(B, H, W, J)).astype(np.float32)
    veil = np.ones((B, J), np.float32)

    m = heatmap_metrics(pred, gt, veil)
    assert m["hm_pck"] == heatmap_pck(pred, gt, veil)
    assert m["hm_pck_loose"] > 0.0          # never an all-zero column
    assert m["hm_pck_loose"] >= m["hm_pck"]
    assert np.isfinite(m["hm_dist"]) and m["hm_dist"] > 0.0

    perfect = heatmap_metrics(gt, gt, veil)
    assert perfect == {"hm_pck": 1.0, "hm_pck_loose": 1.0, "hm_dist": 0.0}

    empty = heatmap_metrics(pred, gt, np.zeros((B, J), np.float32))
    assert empty["hm_pck"] == 0.0 and np.isnan(empty["hm_dist"])
