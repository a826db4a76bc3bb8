"""FSDP (ZeRO-3-style) state sharding: layout + exact parity vs a
single-device step.

The FSDP step runs the global-semantics program (``axis_name=None``):
BN statistics and the contrastive loss see the whole global batch, so a
single-device run on the same batch is the exact oracle — params must
match bit-for-bit, loss/stats to reduction-order tolerance.

Reference anchor: the reference replicates the full model per GPU
(Lightning strategy="dp", src/experiments/main.py:152-163); FSDP is the
TPU-native scale-out of the same training semantics (SCALING.md).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from simhand_tpu.models import ContrastiveModel
from simhand_tpu.models.contrastive import ContrastiveConfig
from simhand_tpu.parallel.fsdp import (
    create_hybrid_mesh,
    leaf_partition_spec,
    make_fsdp_train_step,
)
from simhand_tpu.train import OptimizerConfig, create_train_state
from simhand_tpu.train.loop import make_train_step

SIDE, B = 32, 16


def _make_batch(seed=0):
    rng = np.random.default_rng(seed)
    batch = {
        "transformed_image1": rng.normal(size=(B, SIDE, SIDE, 3)),
        "transformed_image2": rng.normal(size=(B, SIDE, SIDE, 3)),
        "joints1_aug": rng.uniform(0, SIDE, (B, 21, 3)),
        "joints2_aug": rng.uniform(0, SIDE, (B, 21, 3)),
        "joints1_ori": rng.uniform(0, 1, (B, 21, 3)),
        "joints2_ori": rng.uniform(0, 1, (B, 21, 3)),
    }
    for k in ("jitter_x_1", "jitter_x_2", "jitter_y_1", "jitter_y_2"):
        batch[k] = rng.uniform(-10, 0, B)
    for k in ("angle_1", "angle_2"):
        batch[k] = rng.uniform(-45, 45, B)
    return {k: jnp.asarray(v, jnp.float32) for k, v in batch.items()}


def _make_state(model):
    opt_cfg = OptimizerConfig(train_iters_per_epoch=4, epochs=2,
                              warmup_epochs=1)
    return create_train_state(model, opt_cfg, jax.random.key(0),
                              input_shape=(2, SIDE, SIDE, 3))


def _max_diff(a, b):
    return max(
        float(jnp.max(jnp.abs(x.astype(jnp.float32) - y.astype(jnp.float32))))
        for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b))
    )


def test_leaf_partition_spec_rules():
    from jax.sharding import PartitionSpec as P

    # large conv kernel: shard the biggest divisible axis
    assert leaf_partition_spec((3, 3, 128, 256), 8, "data") == \
        P(None, None, None, "data")
    # small leaves stay replicated regardless of divisibility
    assert leaf_partition_spec((256,), 8, "data") == P()
    # scalars
    assert leaf_partition_spec((), 8, "data") == P()
    # no divisible axis -> replicated
    assert leaf_partition_spec((3, 3, 21, 21), 8, "data",
                               min_leaf_elements=1) == P()


@pytest.mark.parametrize("mesh_kind", ["1d", "hybrid"])
def test_fsdp_step_matches_single_device(mesh_kind):
    model = ContrastiveModel(resnet_size="18")
    cfg = ContrastiveConfig(
        experiment_type="simhand_w",
        augmentation=("crop", "rotate", "resize"),
        image_side=float(SIDE),
    )
    batch = _make_batch()

    ref_state, ref_metrics = make_train_step(model, cfg, mesh=None)(
        _make_state(model), batch
    )
    ref_loss = float(ref_metrics["contrastive_loss"])

    if mesh_kind == "1d":
        mesh = Mesh(np.asarray(jax.devices()), ("data",))
    else:
        mesh = create_hybrid_mesh(4, 2)
    n_fsdp = mesh.shape[mesh.axis_names[-1]]

    state = _make_state(model)
    step, place_state, place_batch = make_fsdp_train_step(
        model, cfg, mesh, state
    )
    st = place_state(state)

    # every large leaf is held at exactly 1/n per device (ZeRO layout);
    # optimizer moments shard the same way as their params
    for tree in (st.params, st.opt_state):
        fracs = [
            leaf.addressable_shards[0].data.size / leaf.size
            for leaf in jax.tree.leaves(tree)
            if hasattr(leaf, "addressable_shards") and leaf.size >= 4096
        ]
        assert fracs and min(fracs) == 1.0 / n_fsdp

    new_state, metrics = step(st, place_batch(batch))
    assert abs(float(metrics["contrastive_loss"]) - ref_loss) < 1e-4
    # identical math modulo reduction order; params round through the
    # same optimizer update so they match exactly on CPU
    assert _max_diff(new_state.params, ref_state.params) < 1e-6
    assert _max_diff(new_state.batch_stats, ref_state.batch_stats) < 1e-5

    # the donated, already-sharded state feeds the next step (no
    # re-placement) and the loss stays finite
    new_state, metrics = step(new_state, place_batch(_make_batch(seed=1)))
    assert np.isfinite(float(metrics["contrastive_loss"]))


def test_fsdp_step_with_device_augment():
    """FSDP + the fused on-device augmentation chain: a raw uint8 batch
    compiles and trains under GSPMD with the sharded state."""
    rng = np.random.default_rng(8)
    raw = {
        "image1": jnp.asarray(
            rng.integers(0, 255, (B, 64, 64, 3), dtype=np.uint8)),
        "image2": jnp.asarray(
            rng.integers(0, 255, (B, 64, 64, 3), dtype=np.uint8)),
        "joints1": jnp.asarray(rng.uniform(16, 48, (B, 21, 3)), jnp.float32),
        "joints2": jnp.asarray(rng.uniform(16, 48, (B, 21, 3)), jnp.float32),
        "joints_raw1": jnp.asarray(rng.uniform(0, 1, (B, 21, 3)), jnp.float32),
        "joints_raw2": jnp.asarray(rng.uniform(0, 1, (B, 21, 3)), jnp.float32),
    }
    from simhand_tpu.data.augment_cv2 import AugmentFlags, AugmentParams

    model = ContrastiveModel(resnet_size="18")
    cfg = ContrastiveConfig(
        experiment_type="simhand_w",
        augmentation=("crop", "rotate", "resize"),
        image_side=float(SIDE),
    )
    mesh = Mesh(np.asarray(jax.devices()), ("data",))
    state = _make_state(model)
    flags = AugmentFlags(crop=True, resize=True, rotate=True)
    step, place_state, place_batch = make_fsdp_train_step(
        model, cfg, mesh, state,
        augment=(flags, AugmentParams(resize_shape=(SIDE, SIDE)), SIDE),
    )
    st = place_state(state)
    st, metrics = step(st, place_batch(raw))
    assert np.isfinite(float(metrics["contrastive_loss"]))


def test_fsdp_restores_replicated_dp_checkpoint(tmp_path):
    """Elastic restart across layouts: a checkpoint written by the
    replicated shard_map DP run restores into the FSDP layout (sharded
    template) and training continues — topology/layout changes between
    runs must not invalidate checkpoints."""
    from simhand_tpu.train.checkpoint import CheckpointManager

    model = ContrastiveModel(resnet_size="18")
    cfg = ContrastiveConfig(
        experiment_type="simhand_w",
        augmentation=("crop", "rotate", "resize"),
        image_side=float(SIDE),
    )
    batch = _make_batch()
    # one single-device (replicated-semantics) step, then checkpoint
    state, metrics = make_train_step(model, cfg, mesh=None)(
        _make_state(model), batch
    )
    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    mgr.save(1, jax.device_get(state),
             {"contrastive_loss": float(metrics["contrastive_loss"])})
    mgr.wait()

    # restore with an FSDP-placed template: arrays come back SHARDED
    mesh = Mesh(np.asarray(jax.devices()), ("data",))
    template = _make_state(model)
    step, place_state, place_batch = make_fsdp_train_step(
        model, cfg, mesh, template
    )
    restored = mgr.restore(place_state(template))
    mgr.close()
    n = len(jax.devices())
    big = [p for p in jax.tree.leaves(restored.params) if p.size >= 4096]
    assert big and all(
        p.addressable_shards[0].data.size * n == p.size for p in big
    )
    # the restored values are the DP run's values, not the template's
    assert _max_diff(restored.params, state.params) == 0.0
    # and training continues from them under FSDP
    restored, metrics = step(restored, place_batch(_make_batch(seed=2)))
    assert np.isfinite(float(metrics["contrastive_loss"]))


@pytest.mark.filterwarnings("ignore")
@pytest.mark.slow
def test_pretrain_cli_fsdp_flag(tmp_path, monkeypatch):
    """`--fsdp` on the pretrain CLI: two steps on the synthetic corpus
    train with the state actually sharded, checkpoint + resume intact."""
    import importlib
    import os
    import sys

    monkeypatch.setenv("BASE_PATH", str(tmp_path / "runs"))
    import simhand_tpu.constants as constants

    importlib.reload(constants)
    import simhand_tpu.experiments.main as main_mod

    importlib.reload(main_mod)

    argv = [
        "main.py", "--experiment_type", "simhand_w", "--crop", "--resize",
        "--rotate", "-sources", "synthetic", "-batch_size", "8",
        "-resnet_size", "18", "--data_dir", os.path.join(str(tmp_path), "data"),
        "-experiment_name", "fsdp_cli", "-epochs", "1", "--max_steps", "2",
        "--fsdp",
    ]
    old = sys.argv
    sys.argv = argv
    try:
        state = main_mod.main()
    finally:
        sys.argv = old
    assert int(np.asarray(state.step)) == 2
    n = len(jax.devices())
    big = [p for p in jax.tree.leaves(state.params) if p.size >= 4096]
    assert big and all(
        p.addressable_shards[0].data.size * n == p.size for p in big
    )
