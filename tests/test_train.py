import jax
import jax.numpy as jnp
import numpy as np
import pytest

from simhand_tpu.models import ContrastiveModel
from simhand_tpu.models.contrastive import ContrastiveConfig
from simhand_tpu.parallel import create_mesh
from simhand_tpu.train import (
    OptimizerConfig,
    create_train_state,
    make_eval_step,
    make_train_step,
)
from simhand_tpu.train.optimizer import make_schedule, wd_mask


def synthetic_batch(rng, B, side=32):
    return {
        "transformed_image1": jnp.asarray(
            rng.normal(size=(B, side, side, 3)).astype(np.float32)
        ),
        "transformed_image2": jnp.asarray(
            rng.normal(size=(B, side, side, 3)).astype(np.float32)
        ),
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


def make_state(model, iters=4):
    cfg = OptimizerConfig(train_iters_per_epoch=iters, epochs=2, warmup_epochs=1)
    return create_train_state(
        model, cfg, jax.random.key(0), input_shape=(2, 32, 32, 3)
    )


def test_schedule_warmup_then_cosine():
    cfg = OptimizerConfig(
        lr=1e-4, warmup_epochs=10, epochs=100, train_iters_per_epoch=10
    )
    sched = make_schedule(cfg)
    assert float(sched(0)) == pytest.approx(0.0)
    base = cfg.base_lr
    assert float(sched(cfg.warmup_steps)) == pytest.approx(base, rel=1e-5)
    assert float(sched(cfg.total_steps)) == pytest.approx(0.0, abs=1e-8)
    assert base == pytest.approx(1e-4 * np.sqrt(1024))


def test_wd_mask_excludes_bias_and_bn():
    model = ContrastiveModel(resnet_size="18")
    variables = model.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)))
    mask = wd_mask(variables["params"])
    flat = jax.tree_util.tree_flatten_with_path(mask)[0]
    for path, decayed in flat:
        keys = "/".join(str(getattr(p, "key", p)) for p in path).lower()
        if "bias" in keys or "bn" in keys:
            assert not decayed, keys
    assert any(d for _, d in flat)  # conv/dense kernels do decay


@pytest.mark.parametrize("etype", ["simclr", "simhand_w"])
def test_train_step_runs_and_improves(etype):
    model = ContrastiveModel(resnet_size="18")
    state = make_state(model)
    cfg = ContrastiveConfig(
        experiment_type=etype, augmentation=("crop", "rotate", "resize"),
        image_side=32.0,
    )
    step = make_train_step(model, cfg)
    rng = np.random.default_rng(0)
    batch = synthetic_batch(rng, B=8)
    losses = []
    for _ in range(3):
        state, metrics = step(state, batch)
        losses.append(float(metrics["contrastive_loss"]))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]  # overfits the fixed batch


def test_sharded_eval_matches_single_device():
    model = ContrastiveModel(resnet_size="18")
    state = make_state(model)
    cfg = ContrastiveConfig(experiment_type="simclr", image_side=32.0)
    rng = np.random.default_rng(1)
    batch = synthetic_batch(rng, B=16)

    local_eval = make_eval_step(model, cfg, mesh=None)
    want = float(local_eval(state, batch)["contrastive_loss"])

    mesh = create_mesh()
    sharded_eval = make_eval_step(model, cfg, mesh=mesh)
    got = float(sharded_eval(state, batch)["contrastive_loss"])
    assert got == pytest.approx(want, rel=1e-4)


@pytest.mark.slow
def test_sharded_train_step_runs():
    model = ContrastiveModel(resnet_size="18")
    state = make_state(model)
    cfg = ContrastiveConfig(
        experiment_type="simhand_w", augmentation=("crop", "rotate", "resize"),
        image_side=32.0,
    )
    mesh = create_mesh()
    step = make_train_step(model, cfg, mesh=mesh)
    rng = np.random.default_rng(2)
    batch = synthetic_batch(rng, B=16)
    # step 0 applies lr=0 (warmup starts at zero, faithful to the
    # reference's warmup_start_lr=0); updates kick in from step 1.
    losses = []
    for _ in range(3):
        state, metrics = step(state, batch)
        losses.append(float(metrics["contrastive_loss"]))
    assert all(np.isfinite(losses))
    assert losses[2] != losses[1]


def test_grad_accumulation_multisteps():
    model = ContrastiveModel(resnet_size="18")
    opt_cfg = OptimizerConfig(
        train_iters_per_epoch=4, epochs=2, warmup_epochs=1,
        accumulate_grad_batches=2,
    )
    state = create_train_state(
        model, opt_cfg, jax.random.key(0), input_shape=(2, 32, 32, 3)
    )
    cfg = ContrastiveConfig(experiment_type="simclr", image_side=32.0)
    step = make_train_step(model, cfg)
    rng = np.random.default_rng(3)
    batch = synthetic_batch(rng, B=8)
    params_before = jax.tree.leaves(state.params)[0].copy()
    state, _ = step(state, batch)  # first micro-batch: no param update yet
    np.testing.assert_array_equal(
        np.asarray(jax.tree.leaves(state.params)[0]), np.asarray(params_before)
    )
    # second micro-batch applies the first update — at warmup lr=0, so
    # params move only after the *second* applied update (micro-steps 3-4).
    for _ in range(3):
        state, _ = step(state, batch)
    assert not np.allclose(
        np.asarray(jax.tree.leaves(state.params)[0]), np.asarray(params_before)
    )


def test_sharded_weighted_eval_matches_single_device():
    """simhand_w (equivariance + adaptive weights + global stats) sharded
    over 8 devices == single-device full batch."""
    model = ContrastiveModel(resnet_size="18")
    state = make_state(model)
    cfg = ContrastiveConfig(
        experiment_type="simhand_w", augmentation=("crop", "rotate", "resize"),
        image_side=32.0, weight_type="linear", diff_type="mpjpe",
        pos_neg="pos_neg", joints_type="original",
    )
    rng = np.random.default_rng(17)
    batch = synthetic_batch(rng, B=16)

    want = float(make_eval_step(model, cfg, mesh=None)(state, batch)["contrastive_loss"])
    got = float(
        make_eval_step(model, cfg, mesh=create_mesh())(state, batch)["contrastive_loss"]
    )
    assert got == pytest.approx(want, rel=1e-4)


def test_cross_replica_bn_trains_on_mesh():
    """bn_axis_name='data' syncs BN statistics over the mesh; the sharded
    train step still runs and produces finite loss."""
    model = ContrastiveModel(resnet_size="18", bn_axis_name="data")
    state = make_state(model)
    cfg = ContrastiveConfig(experiment_type="simclr", image_side=32.0)
    mesh = create_mesh()
    step = make_train_step(model, cfg, mesh=mesh)
    rng = np.random.default_rng(23)
    batch = synthetic_batch(rng, B=16)
    state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["contrastive_loss"]))


@pytest.mark.slow
def test_projection_stats_metrics_logged_for_equivariant():
    """peclr-family steps emit the reference's per-axis projection stats
    (reference: peclr_model.py:98-112); simclr steps do not."""
    import jax
    import jax.numpy as jnp

    from simhand_tpu.models import ContrastiveModel
    from simhand_tpu.models.contrastive import ContrastiveConfig, projection_stats
    from simhand_tpu.train import OptimizerConfig, create_train_state, make_train_step

    model = ContrastiveModel(resnet_size="18")
    state = create_train_state(
        model, OptimizerConfig(train_iters_per_epoch=4, epochs=1),
        jax.random.key(0), input_shape=(2, 32, 32, 3),
    )
    rng = np.random.default_rng(0)
    B = 4
    batch = {
        "transformed_image1": jnp.asarray(rng.normal(size=(B, 32, 32, 3)), jnp.float32),
        "transformed_image2": jnp.asarray(rng.normal(size=(B, 32, 32, 3)), jnp.float32),
        "jitter_x_1": jnp.zeros(B), "jitter_x_2": jnp.zeros(B),
        "jitter_y_1": jnp.zeros(B), "jitter_y_2": jnp.zeros(B),
        "angle_1": jnp.zeros(B), "angle_2": jnp.zeros(B),
    }
    cfg = ContrastiveConfig(experiment_type="peclr",
                            augmentation=("crop", "rotate", "resize"))
    _, metrics = make_train_step(model, cfg)(state, batch)
    for k in ("proj1x_mean", "proj1y_median", "proj2x_min", "proj2y_max"):
        assert k in metrics
    assert np.isfinite(float(metrics["proj1x_mean"]))

    state2 = create_train_state(
        model, OptimizerConfig(train_iters_per_epoch=4, epochs=1),
        jax.random.key(0), input_shape=(2, 32, 32, 3),
    )
    _, m2 = make_train_step(model, ContrastiveConfig(experiment_type="simclr"))(
        state2, batch
    )
    assert not any(k.startswith("proj") for k in m2)

    # oracle: stats of a known tensor
    proj = jnp.asarray(rng.normal(size=(8, 128)), jnp.float32)
    s = projection_stats(proj)
    pts = np.asarray(proj).reshape(8, 64, 2)
    np.testing.assert_allclose(
        float(s["proj1x_mean"]), pts[:4, :, 0].mean(), rtol=1e-5
    )
    np.testing.assert_allclose(
        float(s["proj2y_max"]), pts[4:, :, 1].max(axis=1).mean(), rtol=1e-5
    )
    # median: torch.median lower-middle semantics (64 points is even),
    # not np.median's interpolation — matches the reference's torch logs
    np.testing.assert_allclose(
        float(s["proj1y_median"]),
        np.sort(pts[:4, :, 1], axis=1)[:, (64 - 1) // 2].mean(), rtol=1e-5,
    )


def test_mesh_batch_stats_are_replica_mean():
    """Per-replica BN stats diverge across shards; the mesh step persists
    their cross-replica AVERAGE (deliberate torch-DDP-like semantics, not
    an accidental replica pick). Oracle: run each shard through
    model.apply serially from the same initial state and tree-average the
    mutated batch_stats."""
    model = ContrastiveModel(resnet_size="18")
    state = make_state(model)
    cfg = ContrastiveConfig(
        experiment_type="simclr", augmentation=("crop", "rotate", "resize"),
        image_side=32.0,
    )
    mesh = create_mesh()
    n = mesh.devices.size
    step = make_train_step(model, cfg, mesh=mesh)
    rng = np.random.default_rng(3)
    batch = synthetic_batch(rng, B=2 * n)

    # serial oracle: per-shard mutated stats, then average
    per_shard = []
    for d in range(n):
        sl = slice(2 * d, 2 * (d + 1))
        images = jnp.concatenate(
            [batch["transformed_image1"][sl], batch["transformed_image2"][sl]]
        )
        _, mutated = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            images, train=True, mutable=["batch_stats"],
        )
        per_shard.append(mutated["batch_stats"])
    want = jax.tree.map(lambda *s: jnp.mean(jnp.stack(s), 0), *per_shard)

    new_state, _ = step(state, batch)
    got = jax.device_get(new_state.batch_stats)
    flat_w, _ = jax.tree_util.tree_flatten(want)
    flat_g, _ = jax.tree_util.tree_flatten(got)
    assert len(flat_w) == len(flat_g) > 0
    for w, g in zip(flat_w, flat_g):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=2e-3, atol=2e-4)


@pytest.mark.slow
def test_grad_accumulation_equivalent_to_averaged_update():
    """MultiSteps(k) over k micro-batches applies exactly the update of
    the k-averaged gradient through the same LARS+Adam+schedule stack —
    the global-batch-8192 semantics of the reference's num_of_mini_batch
    (BASELINE config #4). Bitwise up to f32 mean association."""
    from simhand_tpu.train.optimizer import make_optimizer

    model = ContrastiveModel(resnet_size="18")
    cfg = ContrastiveConfig(
        experiment_type="simclr", augmentation=("crop", "rotate", "resize"),
        image_side=32.0,
    )
    rng = np.random.default_rng(7)
    micro = [synthetic_batch(rng, B=4) for _ in range(2)]

    opt_accum = OptimizerConfig(
        train_iters_per_epoch=4, epochs=2, warmup_epochs=1,
        accumulate_grad_batches=2,
    )
    state = create_train_state(
        model, opt_accum, jax.random.key(0), input_shape=(2, 32, 32, 3)
    )
    # the jitted step donates the state — snapshot before stepping
    params0 = jax.tree.map(lambda x: np.asarray(x).copy(), state.params)
    stats0 = jax.tree.map(lambda x: np.asarray(x).copy(), state.batch_stats)
    step = make_train_step(model, cfg)
    s_accum = state
    for b in micro:
        s_accum, _ = step(s_accum, b)

    # manual path: average the two micro-grads, apply once through the
    # same inner optimizer (same lr schedule position)
    from simhand_tpu.train.loop import _step_fn  # grads via the same loss

    def grads_of(batch):
        import jax.numpy as jnp
        from simhand_tpu.models.contrastive import (
            contrastive_loss_from_projections,
        )

        def loss_fn(params):
            images = jnp.concatenate(
                [batch["transformed_image1"], batch["transformed_image2"]]
            )
            (_, proj), _ = model.apply(
                {"params": params, "batch_stats": stats0},
                images, train=True, mutable=["batch_stats"],
            )
            loss, _ = contrastive_loss_from_projections(proj, batch, cfg, None)
            return loss

        return jax.grad(loss_fn)(params0)

    g = jax.tree.map(
        lambda a, b: (a + b) / 2.0, grads_of(micro[0]), grads_of(micro[1])
    )
    # the inner (unwrapped) optimizer with identical base lr and
    # schedule geometry: base_lr = lr*sqrt(1024*accum) and steps/accum
    import math

    opt_plain = OptimizerConfig(
        train_iters_per_epoch=2, epochs=2, warmup_epochs=1,
        accumulate_grad_batches=1,
        lr=opt_accum.lr * math.sqrt(2),
    )
    assert opt_plain.base_lr == pytest.approx(opt_accum.base_lr)
    assert opt_plain.total_steps == opt_accum.total_steps
    tx = make_optimizer(opt_plain, params0)
    opt_state = tx.init(params0)
    updates, _ = tx.update(g, opt_state, params0)
    import optax

    want = optax.apply_updates(params0, updates)

    for a, b in zip(jax.tree.leaves(want), jax.tree.leaves(s_accum.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)
