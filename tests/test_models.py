import jax
import jax.numpy as jnp
import numpy as np
import pytest

from simhand_tpu.models import (
    ContrastiveModel,
    ProjectionHead,
    resnet18,
    resnet50,
    rotate_encodings,
    translate_encodings,
)
from simhand_tpu.models.contrastive import (
    ContrastiveConfig,
    contrastive_loss_from_projections,
)


def n_params(tree):
    return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(tree))


def test_resnet50_param_count_matches_torchvision():
    model = resnet50()
    variables = model.init(jax.random.key(0), jnp.zeros((1, 64, 64, 3)))
    # torchvision resnet50 minus fc: 25,557,032 - (2048*1000 + 1000)
    assert n_params(variables["params"]) == 23_508_032


def test_resnet18_param_count_matches_torchvision():
    model = resnet18()
    variables = model.init(jax.random.key(0), jnp.zeros((1, 64, 64, 3)))
    # torchvision resnet18 minus fc: 11,689,512 - (512*1000 + 1000)
    assert n_params(variables["params"]) == 11_176_512


def test_resnet_output_shapes():
    model = resnet50(pool=False)
    variables = model.init(jax.random.key(0), jnp.zeros((2, 128, 128, 3)))
    feats = model.apply(variables, jnp.zeros((2, 128, 128, 3)))
    assert feats.shape == (2, 4, 4, 2048)

    pooled = resnet50(pool=True)
    variables = pooled.init(jax.random.key(0), jnp.zeros((2, 128, 128, 3)))
    emb = pooled.apply(variables, jnp.zeros((2, 128, 128, 3)))
    assert emb.shape == (2, 2048)


def test_projection_head_shapes():
    head = ProjectionHead()
    variables = head.init(jax.random.key(0), jnp.zeros((4, 2048)))
    out = head.apply(variables, jnp.ones((4, 2048)))
    assert out.shape == (4, 128)


def test_rotate_encodings_matches_cv2():
    cv2 = pytest.importorskip("cv2")
    rng = np.random.default_rng(0)
    enc = rng.normal(size=(3, 64, 2)).astype(np.float32)
    ang = np.array([15.0, -40.0, 90.0], dtype=np.float32)
    got = np.asarray(rotate_encodings(jnp.asarray(enc), jnp.asarray(ang)))
    for b in range(3):
        c = enc[b].mean(axis=0)
        m = cv2.getRotationMatrix2D((float(c[0]), float(c[1])), float(ang[b]), 1.0)
        want = enc[b] @ m[:, :2].T + m[:, 2]
        np.testing.assert_allclose(got[b], want, rtol=1e-4, atol=1e-5)


def test_rotate_encodings_inverse_roundtrip():
    rng = np.random.default_rng(1)
    enc = jnp.asarray(rng.normal(size=(2, 64, 2)).astype(np.float32))
    ang = jnp.asarray([33.0, -70.0])
    out = rotate_encodings(rotate_encodings(enc, ang), -ang)
    np.testing.assert_allclose(np.asarray(out), np.asarray(enc), rtol=1e-4, atol=1e-5)


def test_translate_encodings_semantics():
    rng = np.random.default_rng(2)
    enc = rng.normal(size=(2, 64, 2)).astype(np.float32)
    tx = np.array([0.1, -0.2], dtype=np.float32)
    ty = np.array([0.3, 0.0], dtype=np.float32)
    got = np.asarray(
        translate_encodings(jnp.asarray(enc), jnp.asarray(tx), jnp.asarray(ty))
    )
    spread = enc.max(axis=1) - enc.min(axis=1)
    want = enc.copy()
    want[..., 0] += (tx * spread[:, 0])[:, None]
    want[..., 1] += (ty * spread[:, 1])[:, None]
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize(
    "etype", ["simclr", "simclr_w", "peclr", "peclr_w", "simhand", "simhand_w"]
)
def test_contrastive_loss_runs_all_types(etype):
    rng = np.random.default_rng(3)
    B = 4
    proj = jnp.asarray(rng.normal(size=(2 * B, 128)).astype(np.float32))
    batch = {
        "jitter_x_1": jnp.asarray(rng.uniform(-10, 0, B).astype(np.float32)),
        "jitter_x_2": jnp.asarray(rng.uniform(-10, 0, B).astype(np.float32)),
        "jitter_y_1": jnp.asarray(rng.uniform(-10, 0, B).astype(np.float32)),
        "jitter_y_2": jnp.asarray(rng.uniform(-10, 0, B).astype(np.float32)),
        "angle_1": jnp.asarray(rng.uniform(-45, 45, B).astype(np.float32)),
        "angle_2": jnp.asarray(rng.uniform(-45, 45, B).astype(np.float32)),
        "joints1_aug": jnp.asarray(rng.uniform(0, 128, (B, 21, 3)).astype(np.float32)),
        "joints2_aug": jnp.asarray(rng.uniform(0, 128, (B, 21, 3)).astype(np.float32)),
        "joints1_ori": jnp.asarray(rng.uniform(0, 128, (B, 21, 3)).astype(np.float32)),
        "joints2_ori": jnp.asarray(rng.uniform(0, 128, (B, 21, 3)).astype(np.float32)),
    }
    cfg = ContrastiveConfig(
        experiment_type=etype, augmentation=("crop", "rotate", "resize")
    )
    loss, (z1, z2) = contrastive_loss_from_projections(proj, batch, cfg)
    assert np.isfinite(float(loss))
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(z1), axis=1), np.ones(B), rtol=1e-5
    )


def test_contrastive_model_end_to_end_shapes():
    model = ContrastiveModel(resnet_size="18")
    imgs = jnp.zeros((4, 64, 64, 3))
    variables = model.init(jax.random.key(0), imgs)
    emb, proj = model.apply(variables, imgs)
    assert emb.shape == (4, 512) and proj.shape == (4, 128)


def test_contrastive_model_train_mode_updates_batch_stats():
    model = ContrastiveModel(resnet_size="18")
    imgs = jnp.asarray(
        np.random.default_rng(5).normal(size=(4, 64, 64, 3)).astype(np.float32)
    )
    variables = model.init(jax.random.key(0), imgs)
    (_, _), mutated = model.apply(
        variables, imgs, train=True, mutable=["batch_stats"]
    )
    before = jax.tree.leaves(variables["batch_stats"])
    after = jax.tree.leaves(mutated["batch_stats"])
    assert any(
        not np.allclose(np.asarray(a), np.asarray(b)) for a, b in zip(before, after)
    )


def test_simhand_w_full_pipeline_matches_numpy_oracle():
    """End-to-end simhand_w step math (normalize -> view(64,2) ->
    translate(-jitter/side, spread-scaled) -> rotate(-angle, centroid) ->
    renormalize -> linear mpjpe weights -> weighted NT-Xent) against an
    independent numpy transcription of the reference equations."""
    rng = np.random.default_rng(42)
    B, D, side, T = 5, 128, 128.0, 0.5
    proj = rng.normal(size=(2 * B, D)).astype(np.float64)
    jx = rng.uniform(-15, 0, 2 * B)
    jy = rng.uniform(-15, 0, 2 * B)
    ang = np.floor(rng.uniform(-45, 45, 2 * B))
    j1 = rng.uniform(0, 128, (B, 21, 2))
    j2 = rng.uniform(0, 128, (B, 21, 2))

    # ---- numpy oracle ----
    def norm(x):
        return x / np.maximum(np.linalg.norm(x, axis=-1, keepdims=True), 1e-12)

    z = np.concatenate([norm(proj[:B]), norm(proj[B:])]).reshape(2 * B, 64, 2)
    # translate by -jitter/side scaled by per-sample spread
    spread = z.max(axis=1) - z.min(axis=1)
    z[..., 0] += (-jx / side * spread[:, 0])[:, None]
    z[..., 1] += (-jy / side * spread[:, 1])[:, None]
    # rotate by -angle about centroid (OpenCV convention)
    for i in range(2 * B):
        c = z[i].mean(axis=0)
        a = np.deg2rad(-ang[i])
        al, be = np.cos(a), np.sin(a)
        M = np.array([[al, be, (1 - al) * c[0] - be * c[1]],
                      [-be, al, be * c[0] + (1 - al) * c[1]]])
        z[i] = z[i] @ M[:, :2].T + M[:, 2]
    z = z.reshape(2 * B, D)
    z1o, z2o = norm(z[:B]), norm(z[B:])
    # weights (mpjpe linear)
    pd = np.linalg.norm(j1 - j2, axis=-1).mean(1)
    pw = (pd.max() - pd) / (pd.max() - pd.min())
    bj = np.concatenate([j1, j2])
    nd = np.linalg.norm(bj[:, None] - bj[None, :], axis=-1).mean(-1)
    nw = (nd.max() - nd) / (nd.max() - nd.min())
    zc = np.concatenate([z1o, z2o])
    sim = np.exp(zc @ zc.T * nw / T)
    neg = (sim * (1 - np.eye(2 * B))).sum(1)
    pos = np.exp(np.sum(z1o * z2o, -1) * pw / T)
    pos = np.concatenate([pos, pos])
    want = float(np.mean(-np.log(pos / neg)))

    # ---- ours ----
    batch = {
        "jitter_x_1": jnp.asarray(jx[:B], jnp.float32),
        "jitter_x_2": jnp.asarray(jx[B:], jnp.float32),
        "jitter_y_1": jnp.asarray(jy[:B], jnp.float32),
        "jitter_y_2": jnp.asarray(jy[B:], jnp.float32),
        "angle_1": jnp.asarray(ang[:B], jnp.float32),
        "angle_2": jnp.asarray(ang[B:], jnp.float32),
        "joints1_aug": jnp.asarray(
            np.concatenate([j1, np.ones((B, 21, 1))], -1), jnp.float32),
        "joints2_aug": jnp.asarray(
            np.concatenate([j2, np.ones((B, 21, 1))], -1), jnp.float32),
    }
    cfg = ContrastiveConfig(
        experiment_type="simhand_w", augmentation=("crop", "rotate", "resize"),
        image_side=side, weight_type="linear", diff_type="mpjpe",
        pos_neg="pos_neg", joints_type="aug",
    )
    got, _ = contrastive_loss_from_projections(
        jnp.asarray(proj, jnp.float32), batch, cfg
    )
    assert float(got) == pytest.approx(want, rel=1e-4)


def test_space_to_depth_stem_equivalence():
    """s2d stem kernel rearrangement == the 7x7/2 torchvision stem."""
    from simhand_tpu.models.resnet import s2d_stem_kernel, space_to_depth

    rng = np.random.default_rng(13)
    x = jnp.asarray(rng.normal(size=(2, 32, 32, 3)).astype(np.float32))
    w7 = jnp.asarray(rng.normal(size=(7, 7, 3, 16)).astype(np.float32))
    ref = jax.lax.conv_general_dilated(
        x.transpose(0, 3, 1, 2), w7.transpose(3, 2, 0, 1), (2, 2),
        [(3, 3), (3, 3)],
    )
    got = jax.lax.conv_general_dilated(
        space_to_depth(x, 2).transpose(0, 3, 1, 2),
        s2d_stem_kernel(w7).transpose(3, 2, 0, 1), (1, 1), [(2, 1), (2, 1)],
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)


def test_resnet_s2d_stem_shapes():
    from simhand_tpu.models.resnet import resnet18

    model = resnet18(stem="space_to_depth")
    v = model.init(jax.random.key(0), jnp.zeros((1, 64, 64, 3)))
    out = model.apply(v, jnp.zeros((1, 64, 64, 3)))
    assert out.shape == (1, 512)
    assert "conv1_s2d" in v["params"]


def test_equivariance_inverse_aligns_rotated_projections():
    """The PeCLR property: if view-1's projection is view-2's projection
    rotated by theta (a perfectly equivariant encoder), the inverse
    transform recovers z1 == z2 exactly; skipping it does not."""
    from simhand_tpu.models.equivariance import (
        inverse_transform_projections,
        rotate_encodings,
    )

    rng = np.random.default_rng(77)
    B, D = 6, 128
    p2 = rng.normal(size=(B, D)).astype(np.float32)
    p2 /= np.linalg.norm(p2, axis=1, keepdims=True)
    theta = jnp.asarray(rng.uniform(-45, 45, B).astype(np.float32))
    p1 = np.asarray(
        rotate_encodings(jnp.asarray(p2).reshape(B, D // 2, 2), theta)
    ).reshape(B, D)

    proj = jnp.asarray(np.concatenate([p1, p2]), jnp.float32)
    z1, z2 = inverse_transform_projections(
        proj, None, None,
        jnp.concatenate([theta, jnp.zeros(B)]), image_side=128.0,
    )
    cos_with = np.sum(np.asarray(z1) * np.asarray(z2), axis=1)
    np.testing.assert_allclose(cos_with, 1.0, atol=1e-5)

    z1n, z2n = inverse_transform_projections(proj, None, None, None, 128.0)
    cos_without = np.sum(np.asarray(z1n) * np.asarray(z2n), axis=1)
    assert cos_without.mean() < 0.999


def test_subsampled_bn_matches_flax_at_subsample_1():
    import flax.linen as nn

    from simhand_tpu.models.norm import SubsampledBatchNorm

    rng = np.random.default_rng(91)
    x = jnp.asarray(rng.normal(size=(16, 4, 4, 8)).astype(np.float32))
    a = SubsampledBatchNorm(subsample=1, use_running_average=False)
    b = nn.BatchNorm(use_running_average=False, momentum=0.9, epsilon=1e-5)
    va = a.init(jax.random.key(1), x)
    vb = b.init(jax.random.key(1), x)
    ya, ma = a.apply(va, x, mutable=["batch_stats"])
    yb, mb = b.apply(vb, x, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(ya), np.asarray(yb), atol=2e-6)
    np.testing.assert_allclose(
        np.asarray(jax.tree.leaves(ma)[0]), np.asarray(jax.tree.leaves(mb)[0]),
        atol=1e-6,
    )


@pytest.mark.slow
def test_subsampled_bn_model_trains():
    from simhand_tpu.models.contrastive import (
        ContrastiveConfig,
        contrastive_loss_from_projections,
    )

    model = ContrastiveModel(resnet_size="18", bn_subsample=4)
    rng = np.random.default_rng(92)
    imgs = jnp.asarray(rng.normal(size=(8, 32, 32, 3)).astype(np.float32))
    v = model.init(jax.random.key(0), imgs)

    def loss(p):
        (_, proj), _ = model.apply(
            {"params": p, "batch_stats": v["batch_stats"]}, imgs,
            train=True, mutable=["batch_stats"],
        )
        l, _ = contrastive_loss_from_projections(
            proj, {}, ContrastiveConfig(experiment_type="simclr")
        )
        return l

    g = jax.grad(loss)(v["params"])
    assert all(np.isfinite(np.asarray(x)).all() for x in jax.tree.leaves(g))


def test_translate_encodings_exact():
    """Exact-shift variant adds normalized jitter directly
    (reference: src/models/utils.py:686-701)."""
    from simhand_tpu.models.equivariance import translate_encodings_exact

    enc = jnp.asarray(np.random.default_rng(0).normal(size=(4, 64, 2)))
    tx = jnp.asarray([0.1, -0.2, 0.0, 0.5])
    ty = jnp.asarray([-0.3, 0.4, 0.1, 0.0])
    out = translate_encodings_exact(enc, tx, ty)
    np.testing.assert_allclose(
        np.asarray(out[..., 0]), np.asarray(enc[..., 0]) + np.asarray(tx)[:, None],
        rtol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(out[..., 1]), np.asarray(enc[..., 1]) + np.asarray(ty)[:, None],
        rtol=1e-6,
    )


def test_heatmap_transformation_matrix_and_theta():
    """The (B,2,3) matrix equals rotation-about-centre composed with a pixel
    translation; theta conversion matches the torch affine_grid formula."""
    import cv2

    from simhand_tpu.models.heads import (
        affine_mat_to_theta,
        heatmap_transformation_matrix,
    )

    jx, jy = np.float32([3.0, -2.0]), np.float32([-1.0, 4.0])
    scale, angle = np.float32([1.2, 0.8]), np.float32([30.0, -15.0])
    dim = (32.0, 32.0)
    mats = np.asarray(heatmap_transformation_matrix(jx, jy, scale, angle, dim))
    for i in range(2):
        rot = cv2.getRotationMatrix2D((16.0, 16.0), float(angle[i]),
                                      float(scale[i]))
        trans = np.array([[1, 0, jx[i]], [0, 1, jy[i]], [0, 0, 1]], np.float64)
        expected = rot @ trans
        np.testing.assert_allclose(mats[i], expected, atol=1e-5)

    theta = np.asarray(affine_mat_to_theta(jnp.asarray(mats), 32.0, 32.0))
    m = mats
    np.testing.assert_allclose(
        theta[:, 0, 2], m[:, 0, 2] * 2 / 32 + m[:, 0, 0] + m[:, 0, 1] - 1,
        atol=1e-6,
    )
    np.testing.assert_allclose(theta[:, 0, 0], m[:, 0, 0], atol=1e-6)
    np.testing.assert_allclose(theta[:, 1, 0], m[:, 1, 0], atol=1e-6)


def test_model_tester_cli(capsys):
    from simhand_tpu.experiments.model_tester import main

    main(["--resnet_size", "18"])
    out = capsys.readouterr().out
    assert "total parameters" in out and "resnet18" in out


def test_fused_bn_matches_flax_exactly():
    """FusedBatchNorm: identical outputs/running stats to flax BatchNorm,
    and the hand-written VJP matches autodiff of the same math."""
    import flax.linen as nn_
    import jax

    from simhand_tpu.models.fused_bn import FusedBatchNorm

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(8, 4, 4, 6)), jnp.float32)

    ref = nn_.BatchNorm(use_running_average=False, momentum=0.9, epsilon=1e-5)
    fused = FusedBatchNorm(use_running_average=False, momentum=0.9,
                           epsilon=1e-5)
    vr = ref.init(jax.random.key(0), x)
    vf = fused.init(jax.random.key(0), x)
    # same param/stat trees (bias/scale under params, mean/var stats)
    assert set(vr["params"]) == set(vf["params"])

    # make params non-trivial
    scale = jnp.asarray(rng.uniform(0.5, 1.5, 6), jnp.float32)
    bias = jnp.asarray(rng.normal(size=6), jnp.float32)
    pr = {"params": {"scale": scale, "bias": bias}, "batch_stats": vr["batch_stats"]}

    yr, mr = ref.apply(pr, x, mutable=["batch_stats"])
    yf, mf = fused.apply(pr, x, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(yf), np.asarray(yr), atol=2e-6)
    for k in ("mean", "var"):
        np.testing.assert_allclose(
            np.asarray(mf["batch_stats"][k]), np.asarray(mr["batch_stats"][k]),
            atol=1e-6,
        )

    # gradients: fused VJP vs autodiff through flax BN
    def loss_ref(params, x):
        y, _ = ref.apply(
            {"params": params, "batch_stats": vr["batch_stats"]}, x,
            mutable=["batch_stats"],
        )
        return jnp.sum(jnp.sin(y))

    def loss_fused(params, x):
        y, _ = fused.apply(
            {"params": params, "batch_stats": vf["batch_stats"]}, x,
            mutable=["batch_stats"],
        )
        return jnp.sum(jnp.sin(y))

    params = {"scale": scale, "bias": bias}
    gr_p, gr_x = jax.grad(loss_ref, argnums=(0, 1))(params, x)
    gf_p, gf_x = jax.grad(loss_fused, argnums=(0, 1))(params, x)
    np.testing.assert_allclose(np.asarray(gf_x), np.asarray(gr_x), atol=3e-5)
    np.testing.assert_allclose(
        np.asarray(gf_p["scale"]), np.asarray(gr_p["scale"]), atol=3e-5)
    np.testing.assert_allclose(
        np.asarray(gf_p["bias"]), np.asarray(gr_p["bias"]), atol=3e-5)

    # eval mode uses running averages identically
    ref_e = nn_.BatchNorm(use_running_average=True, momentum=0.9,
                          epsilon=1e-5)
    fused_e = FusedBatchNorm(use_running_average=True, momentum=0.9,
                             epsilon=1e-5)
    pr2 = {"params": params, "batch_stats": mr["batch_stats"]}
    ye_r = ref_e.apply(pr2, x)
    ye_f = fused_e.apply(pr2, x)
    np.testing.assert_allclose(np.asarray(ye_f), np.asarray(ye_r), atol=2e-6)


def test_fused_bn_resnet_trains():
    """bn_fused resnet runs a full value_and_grad step with finite loss
    and grads matching the default-BN model closely."""
    import jax

    from simhand_tpu.models.resnet import resnet18

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(4, 32, 32, 3)), jnp.float32)

    m_ref = resnet18()
    m_fused = resnet18(bn_fused=True)
    v = m_ref.init(jax.random.key(0), x, train=False)

    def loss(model, params, stats):
        def f(p):
            out, mut = model.apply(
                {"params": p, "batch_stats": stats}, x, train=True,
                mutable=["batch_stats"],
            )
            return jnp.mean(out ** 2)
        return jax.value_and_grad(f)(params)

    l_r, g_r = loss(m_ref, v["params"], v["batch_stats"])
    l_f, g_f = loss(m_fused, v["params"], v["batch_stats"])
    np.testing.assert_allclose(float(l_f), float(l_r), rtol=1e-5)
    flat_r = jnp.concatenate([a.ravel() for a in jax.tree.leaves(g_r)])
    flat_f = jnp.concatenate([a.ravel() for a in jax.tree.leaves(g_f)])
    np.testing.assert_allclose(
        np.asarray(flat_f), np.asarray(flat_r), atol=5e-4)


def test_fused_bn_stop_gradient_matches_subsampled_variant():
    """bn_fused + stop_gradient_stats == SubsampledBatchNorm(stop_gradient
    _stats=True) in outputs and gradients."""
    import jax

    from simhand_tpu.models.fused_bn import FusedBatchNorm
    from simhand_tpu.models.norm import SubsampledBatchNorm

    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(8, 4, 4, 6)), jnp.float32)
    scale = jnp.asarray(rng.uniform(0.5, 1.5, 6), jnp.float32)
    bias = jnp.asarray(rng.normal(size=6), jnp.float32)

    a = FusedBatchNorm(use_running_average=False, stop_gradient_stats=True)
    b = SubsampledBatchNorm(subsample=1, stop_gradient_stats=True,
                            use_running_average=False)
    va, vb = a.init(jax.random.key(0), x), b.init(jax.random.key(0), x)
    params = {"scale": scale, "bias": bias}

    def loss(mod, stats, p, x):
        y, _ = mod.apply({"params": p, "batch_stats": stats}, x,
                         mutable=["batch_stats"])
        return jnp.sum(jnp.sin(y))

    la, (ga_p, ga_x) = (
        loss(a, va["batch_stats"], params, x),
        jax.grad(lambda p, x: loss(a, va["batch_stats"], p, x),
                 argnums=(0, 1))(params, x),
    )
    lb, (gb_p, gb_x) = (
        loss(b, vb["batch_stats"], params, x),
        jax.grad(lambda p, x: loss(b, vb["batch_stats"], p, x),
                 argnums=(0, 1))(params, x),
    )
    np.testing.assert_allclose(float(la), float(lb), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(ga_x), np.asarray(gb_x), atol=3e-5)
    np.testing.assert_allclose(
        np.asarray(ga_p["scale"]), np.asarray(gb_p["scale"]), atol=3e-5)


@pytest.mark.slow
def test_fused_bn_pallas_reduce_matches_xla():
    """reduce_impl='pallas' (interpret on CPU) gives the same gradients as
    the jnp path across a full rn18 step."""
    import jax

    from simhand_tpu.models.resnet import resnet18

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(8, 32, 32, 3)), jnp.float32)
    m_x = resnet18(bn_fused=True)
    m_p = resnet18(bn_fused="pallas")
    v = m_x.init(jax.random.key(0), x, train=False)

    def grads(model):
        def f(p):
            out, _ = model.apply(
                {"params": p, "batch_stats": v["batch_stats"]}, x, train=True,
                mutable=["batch_stats"],
            )
            return jnp.mean(out ** 2)
        return jax.value_and_grad(f)(v["params"])

    l_x, g_x = grads(m_x)
    l_p, g_p = grads(m_p)
    np.testing.assert_allclose(float(l_p), float(l_x), rtol=1e-6)
    fx = jnp.concatenate([a.ravel() for a in jax.tree.leaves(g_x)])
    fp = jnp.concatenate([a.ravel() for a in jax.tree.leaves(g_p)])
    np.testing.assert_allclose(np.asarray(fp), np.asarray(fx), atol=1e-4)
