"""Pallas fused NT-Xent denominator kernels vs the XLA reference
(interpret mode — CPU-runnable; the same kernels compile on TPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from simhand_tpu.losses.pallas_ntxent import (
    COL_TILE,
    ROW_TILE,
    ntxent_denominator,
    weighted_ntxent_denominator,
)

T = 0.5


def normalize(x):
    return x / np.linalg.norm(x, axis=-1, keepdims=True)


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(0)
    M, N, D = ROW_TILE, 2 * COL_TILE, 128
    z_cols = normalize(rng.normal(size=(N, D))).astype(np.float32)
    z_rows = z_cols[:M]  # local rows are a prefix of the global set
    row_ids = np.arange(M, dtype=np.int32)
    j_cols = rng.uniform(0, 128, (N, 21, 2)).astype(np.float32)
    j_rows = j_cols[:M]
    return z_rows, z_cols, j_rows, j_cols, row_ids


def test_plain_denominator_matches_reference(data):
    z_rows, z_cols, _, _, row_ids = data
    got = np.asarray(
        ntxent_denominator(
            jnp.asarray(z_rows), jnp.asarray(z_cols), jnp.asarray(row_ids),
            T, interpret=True,
        )
    )
    sim = np.exp(z_rows @ z_cols.T / T)
    sim[np.arange(len(z_rows)), row_ids] = 0.0
    want = sim.sum(axis=1)
    np.testing.assert_allclose(got, want, rtol=2e-5)


def test_weighted_denominator_matches_reference(data):
    z_rows, z_cols, j_rows, j_cols, row_ids = data
    # reference weight computation
    d = np.linalg.norm(
        j_cols[:, None] - j_cols[None, :], axis=-1
    ).mean(-1)
    d_max, d_min = d.max(), d.min()
    w_rows = (d_max - d[: len(z_rows)]) / (d_max - d_min)  # (M, N)
    sim = np.exp((z_rows @ z_cols.T) * w_rows / T)
    sim[np.arange(len(z_rows)), row_ids] = 0.0
    want = sim.sum(axis=1)

    got = np.asarray(
        weighted_ntxent_denominator(
            jnp.asarray(z_rows), jnp.asarray(z_cols),
            jnp.asarray(j_rows), jnp.asarray(j_cols),
            jnp.asarray(row_ids),
            jnp.float32(d_max), jnp.float32(d_min),
            T, interpret=True,
        )
    )
    np.testing.assert_allclose(got, want, rtol=5e-4)


def test_full_loss_via_pallas_matches_ntxent(data):
    """-log(pos/neg) with the pallas denominator == losses.nt_xent."""
    from simhand_tpu.losses import nt_xent

    z_rows, z_cols, _, _, _ = data
    B = len(z_cols) // 2
    z1, z2 = z_cols[:B], z_cols[B:]
    want = float(nt_xent(jnp.asarray(z1), jnp.asarray(z2), T))

    neg = np.asarray(
        ntxent_denominator(
            jnp.asarray(z_cols), jnp.asarray(z_cols),
            jnp.arange(2 * B, dtype=np.int32), T, interpret=True,
        )
    )
    pos = np.exp(np.sum(z1 * z2, axis=-1) / T)
    pos = np.concatenate([pos, pos])
    got = float(np.mean(-np.log(pos / neg)))
    assert got == pytest.approx(want, rel=1e-5)


def test_nt_xent_pallas_custom_vjp_matches_autodiff():
    """Pallas fwd+bwd vs jax.grad of the XLA nt_xent (interpret mode)."""
    from simhand_tpu.losses import nt_xent
    from simhand_tpu.losses.pallas_ntxent import nt_xent_pallas

    rng = np.random.default_rng(5)
    B = COL_TILE  # 2B divisible by both tile sizes
    z1 = jnp.asarray(normalize(rng.normal(size=(B, 128))), jnp.float32)
    z2 = jnp.asarray(normalize(rng.normal(size=(B, 128))), jnp.float32)

    want_loss = float(nt_xent(z1, z2, T))
    got_loss = float(nt_xent_pallas(z1, z2, T, True))
    assert got_loss == pytest.approx(want_loss, rel=1e-5)

    g_want = jax.grad(lambda a, b: nt_xent(a, b, T), argnums=(0, 1))(z1, z2)
    g_got = jax.grad(
        lambda a, b: nt_xent_pallas(a, b, T, True), argnums=(0, 1)
    )(z1, z2)
    for gw, gg in zip(g_want, g_got):
        np.testing.assert_allclose(
            np.asarray(gg), np.asarray(gw), rtol=2e-4, atol=1e-7
        )


def test_weighted_nt_xent_pallas_matches_xla_loss_and_grads():
    from simhand_tpu.losses import linear_weights, weighted_nt_xent
    from simhand_tpu.losses.pallas_ntxent import weighted_nt_xent_pallas

    rng = np.random.default_rng(9)
    B = COL_TILE
    z1 = jnp.asarray(normalize(rng.normal(size=(B, 128))), jnp.float32)
    z2 = jnp.asarray(normalize(rng.normal(size=(B, 128))), jnp.float32)
    j1 = jnp.asarray(rng.uniform(0, 128, (B, 21, 2)), jnp.float32)
    j2 = jnp.asarray(rng.uniform(0, 128, (B, 21, 2)), jnp.float32)

    pw, nw = linear_weights(j1, j2, "mpjpe")
    want = float(weighted_nt_xent(z1, z2, pw, nw, T))

    joints = jnp.concatenate([j1, j2])
    d = np.linalg.norm(
        np.asarray(joints)[:, None] - np.asarray(joints)[None, :], axis=-1
    ).mean(-1)
    minmax = jnp.asarray([d.max(), d.min()], jnp.float32)
    got = float(
        weighted_nt_xent_pallas(z1, z2, joints, pw, minmax, T, True)
    )
    assert got == pytest.approx(want, rel=1e-4)

    g_want = jax.grad(
        lambda a, b: weighted_nt_xent(a, b, pw, nw, T), argnums=(0, 1)
    )(z1, z2)
    g_got = jax.grad(
        lambda a, b: weighted_nt_xent_pallas(a, b, joints, pw, minmax, T, True),
        argnums=(0, 1),
    )(z1, z2)
    for gw, gg in zip(g_want, g_got):
        np.testing.assert_allclose(
            np.asarray(gg), np.asarray(gw), rtol=1e-3, atol=1e-7
        )


def test_contrastive_step_use_pallas_matches_xla():
    """ContrastiveConfig(use_pallas=True) loss == the XLA path, for both
    the plain and the flagship weighted config."""
    from simhand_tpu.models.contrastive import (
        ContrastiveConfig,
        contrastive_loss_from_projections,
    )

    rng = np.random.default_rng(11)
    B = 256  # 2B = 512, divisible by the kernel tiles
    proj = jnp.asarray(rng.normal(size=(2 * B, 128)), jnp.float32)
    batch = {
        "jitter_x_1": jnp.asarray(rng.uniform(-10, 0, B), jnp.float32),
        "jitter_x_2": jnp.asarray(rng.uniform(-10, 0, B), jnp.float32),
        "jitter_y_1": jnp.asarray(rng.uniform(-10, 0, B), jnp.float32),
        "jitter_y_2": jnp.asarray(rng.uniform(-10, 0, B), jnp.float32),
        "angle_1": jnp.asarray(rng.uniform(-45, 45, B), jnp.float32),
        "angle_2": jnp.asarray(rng.uniform(-45, 45, B), jnp.float32),
        "joints1_aug": jnp.asarray(rng.uniform(0, 128, (B, 21, 3)), jnp.float32),
        "joints2_aug": jnp.asarray(rng.uniform(0, 128, (B, 21, 3)), jnp.float32),
    }
    for etype in ("simclr", "simhand_w"):
        kw = dict(
            experiment_type=etype, augmentation=("crop", "rotate", "resize"),
            weight_type="linear", diff_type="mpjpe", pos_neg="pos_neg",
            joints_type="aug",
        )
        want, _ = contrastive_loss_from_projections(
            proj, batch, ContrastiveConfig(**kw)
        )
        got, _ = contrastive_loss_from_projections(
            proj, batch, ContrastiveConfig(use_pallas=True, **kw)
        )
        assert float(got) == pytest.approx(float(want), rel=1e-4), etype


def test_sharded_pallas_nt_xent_matches_xla_sharded():
    """The sharded pallas loss (rows local, columns gathered, custom VJP
    with collectives) matches the XLA global-batch nt_xent in value AND
    gradient on the 8-device mesh."""
    from jax import shard_map
    from jax.sharding import Mesh, PartitionSpec as P

    from simhand_tpu.losses import nt_xent
    from simhand_tpu.losses.pallas_ntxent import make_sharded_nt_xent_pallas

    rng = np.random.default_rng(31)
    B = 2 * COL_TILE  # per-device 2B/8 = 256 rows, divisible by tiles
    z1 = jnp.asarray(normalize(rng.normal(size=(B, 128))), jnp.float32)
    z2 = jnp.asarray(normalize(rng.normal(size=(B, 128))), jnp.float32)

    mesh = Mesh(np.array(jax.devices()), ("data",))
    pallas_loss = make_sharded_nt_xent_pallas("data", T, interpret=True)

    sharded = jax.jit(
        shard_map(
            pallas_loss, mesh=mesh, in_specs=(P("data"), P("data")),
            out_specs=P(), check_vma=False,
        )
    )
    want = float(nt_xent(z1, z2, T))
    got = float(sharded(z1, z2))
    assert got == pytest.approx(want, rel=1e-5)

    g_want = jax.grad(lambda a, b: nt_xent(a, b, T), argnums=(0, 1))(z1, z2)
    grad_sharded = jax.jit(
        shard_map(
            jax.grad(pallas_loss, argnums=(0, 1)), mesh=mesh,
            in_specs=(P("data"), P("data")),
            out_specs=(P("data"), P("data")), check_vma=False,
        )
    )
    g_got = grad_sharded(z1, z2)
    for gw, gg in zip(g_want, g_got):
        np.testing.assert_allclose(
            np.asarray(gg), np.asarray(gw), rtol=2e-4, atol=1e-7
        )


@pytest.mark.slow
def test_sharded_use_pallas_train_step():
    """make_train_step(mesh=...) with use_pallas routes through the
    sharded pallas loss and still trains (finite, decreasing loss)."""
    from simhand_tpu.models import ContrastiveModel
    from simhand_tpu.models.contrastive import ContrastiveConfig
    from simhand_tpu.parallel import create_mesh
    from simhand_tpu.train import OptimizerConfig, create_train_state, make_train_step

    rng = np.random.default_rng(41)
    B = 1024  # 128/device -> 256 local rows, divisible by ROW_TILE
    batch = {
        "transformed_image1": jnp.asarray(
            rng.normal(size=(B, 16, 16, 3)), jnp.float32),
        "transformed_image2": jnp.asarray(
            rng.normal(size=(B, 16, 16, 3)), jnp.float32),
    }
    model = ContrastiveModel(resnet_size="18")
    state = create_train_state(
        model, OptimizerConfig(train_iters_per_epoch=4, epochs=2, warmup_epochs=1),
        jax.random.key(0), input_shape=(2, 16, 16, 3),
    )
    cfg = ContrastiveConfig(experiment_type="simclr", image_side=16.0,
                            use_pallas=True)
    step = make_train_step(model, cfg, mesh=create_mesh())
    state, m1 = step(state, batch)
    assert np.isfinite(float(m1["contrastive_loss"]))
    state, m2 = step(state, batch)
    state, m3 = step(state, batch)
    assert float(m3["contrastive_loss"]) < float(m1["contrastive_loss"]) + 1e-3


def test_sharded_weighted_pallas_matches_xla():
    """Global-batch simhand_w through pallas (fwd+bwd) == the XLA sharded
    weighted loss, in value and gradient, on the 8-device mesh."""
    from jax import shard_map
    from jax.sharding import Mesh, PartitionSpec as P

    from simhand_tpu.losses import linear_weights, weighted_nt_xent
    from simhand_tpu.losses.pallas_ntxent import (
        make_sharded_weighted_nt_xent_pallas,
    )

    rng = np.random.default_rng(51)
    B = 4 * COL_TILE  # 1024 -> per-device 256 rows
    z1 = jnp.asarray(normalize(rng.normal(size=(B, 128))), jnp.float32)
    z2 = jnp.asarray(normalize(rng.normal(size=(B, 128))), jnp.float32)
    j1 = jnp.asarray(rng.uniform(0, 128, (B, 21, 2)), jnp.float32)
    j2 = jnp.asarray(rng.uniform(0, 128, (B, 21, 2)), jnp.float32)

    pw, nw = linear_weights(j1, j2, "mpjpe")
    want = float(weighted_nt_xent(z1, z2, pw, nw, T))
    g_want = jax.grad(
        lambda a, b: weighted_nt_xent(a, b, pw, nw, T), argnums=(0, 1)
    )(z1, z2)

    mesh = Mesh(np.array(jax.devices()), ("data",))
    loss_fn = make_sharded_weighted_nt_xent_pallas("data", T, interpret=True)

    got = float(jax.jit(shard_map(
        loss_fn, mesh=mesh, in_specs=(P("data"),) * 4, out_specs=P(),
        check_vma=False,
    ))(z1, z2, j1, j2))
    assert got == pytest.approx(want, rel=1e-4)

    g_got = jax.jit(shard_map(
        jax.grad(loss_fn, argnums=(0, 1)), mesh=mesh,
        in_specs=(P("data"),) * 4, out_specs=(P("data"), P("data")),
        check_vma=False,
    ))(z1, z2, j1, j2)
    for gw, gg in zip(g_want, g_got):
        np.testing.assert_allclose(
            np.asarray(gg), np.asarray(gw), rtol=1e-3, atol=1e-7
        )


def test_sharded_use_pallas_weighted_step_matches_xla():
    """The full mesh train-step loss with use_pallas (simhand_w) matches
    the XLA step loss on identical inputs."""
    from simhand_tpu.models import ContrastiveModel
    from simhand_tpu.models.contrastive import ContrastiveConfig
    from simhand_tpu.parallel import create_mesh
    from simhand_tpu.train import OptimizerConfig, create_train_state, make_eval_step

    rng = np.random.default_rng(61)
    B = 1024
    batch = {
        "transformed_image1": jnp.asarray(
            rng.normal(size=(B, 16, 16, 3)), jnp.float32),
        "transformed_image2": jnp.asarray(
            rng.normal(size=(B, 16, 16, 3)), jnp.float32),
        "jitter_x_1": jnp.asarray(rng.uniform(-10, 0, B), jnp.float32),
        "jitter_x_2": jnp.asarray(rng.uniform(-10, 0, B), jnp.float32),
        "jitter_y_1": jnp.asarray(rng.uniform(-10, 0, B), jnp.float32),
        "jitter_y_2": jnp.asarray(rng.uniform(-10, 0, B), jnp.float32),
        "angle_1": jnp.asarray(rng.uniform(-45, 45, B), jnp.float32),
        "angle_2": jnp.asarray(rng.uniform(-45, 45, B), jnp.float32),
        "joints1_aug": jnp.asarray(rng.uniform(0, 128, (B, 21, 3)), jnp.float32),
        "joints2_aug": jnp.asarray(rng.uniform(0, 128, (B, 21, 3)), jnp.float32),
    }
    model = ContrastiveModel(resnet_size="18")
    state = create_train_state(
        model, OptimizerConfig(train_iters_per_epoch=4, epochs=2, warmup_epochs=1),
        jax.random.key(0), input_shape=(2, 16, 16, 3),
    )
    mesh = create_mesh()
    kw = dict(experiment_type="simhand_w",
              augmentation=("crop", "rotate", "resize"), image_side=16.0)
    want = float(
        make_eval_step(model, ContrastiveConfig(**kw), mesh=mesh)(
            state, batch)["contrastive_loss"]
    )
    got = float(
        make_eval_step(model, ContrastiveConfig(use_pallas=True, **kw),
                       mesh=mesh)(state, batch)["contrastive_loss"]
    )
    assert got == pytest.approx(want, rel=1e-4)


def test_sharded_use_pallas_falls_back_when_global_tile_indivisible():
    """A mesh size that satisfies the local row tile but not the plain
    kernel's global column tile (n_global % 512 != 0) must fall back to
    the XLA path at trace time instead of tripping the kernel assert —
    e.g. a 1-device debug mesh with 2B_local = 256."""
    import jax
    from jax import shard_map
    from jax.sharding import Mesh, PartitionSpec as P

    from simhand_tpu.losses import nt_xent
    from simhand_tpu.models.contrastive import (
        ContrastiveConfig,
        contrastive_loss_from_projections,
    )

    rng = np.random.default_rng(17)
    B = 128  # n_rows = 256: % 256 ok, but global 256 % 512 != 0
    proj = jnp.asarray(rng.normal(size=(2 * B, 128)), jnp.float32)
    batch = {}
    cfg = ContrastiveConfig(experiment_type="simclr", augmentation=(),
                            use_pallas=True)
    mesh = Mesh(np.array(jax.devices()[:1]), ("data",))
    sharded = shard_map(
        lambda p: contrastive_loss_from_projections(
            p, batch, cfg, axis_name="data")[0],
        mesh=mesh,
        in_specs=(P("data"),),
        out_specs=P(),
        check_vma=False,
    )
    got = float(jax.jit(sharded)(proj))
    z = proj / jnp.linalg.norm(proj, axis=-1, keepdims=True)
    want = float(nt_xent(z[:B], z[B:]))
    assert got == pytest.approx(want, rel=1e-5)
