"""The sharded pre-training step.

Design (TPU-first):
  * the global batch is sharded over the 1-D "data" ICI mesh axis;
  * each device runs encoder fwd/bwd on its shard (bf16 on the MXU);
  * the contrastive loss all-gathers the 128-D projections (a few MB at
    global batch 8192) and computes its row-shard of the (2N, 2N)
    similarity matrix — the *global* negative set, unlike the reference's
    per-GPU "dp" sub-batches;
  * gradients are pmean-reduced over ICI; optimizer state and params are
    replicated.

Everything is a single jit-compiled ``shard_map`` program: XLA overlaps
the gradient all-reduce with backprop, and there is no per-step host sync
except the scalar metrics fetch.

BatchNorm statistics are per-replica by default, matching the reference's
DataParallel behavior (SURVEY.md hard part 4); pass
``ContrastiveModel(bn_axis_name="data")`` for cross-replica sync.
"""
from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from simhand_tpu.models.contrastive import (
    _EQUIVARIANT,
    ContrastiveConfig,
    contrastive_loss_from_projections,
    projection_stats,
)
from simhand_tpu.parallel.mesh import DATA_AXIS


def _step_fn(
    state,
    batch,
    model,
    cfg: ContrastiveConfig,
    axis_name: str | None,
    augment=None,
):
    """One SGD step on a (possibly per-device) batch shard.

    With ``augment=(flags, params, out_size)``, ``batch`` is a *raw* host
    batch (uint8 crops + joints; see data.augment.prepare_views) and both
    views are augmented on-device inside this jit program — the
    production input path.
    """
    if augment is not None:
        from simhand_tpu.data.augment import prepare_views

        flags, params, out_size = augment
        key = jax.random.fold_in(jax.random.key(0), state.step)
        if axis_name is not None:
            key = jax.random.fold_in(key, jax.lax.axis_index(axis_name))
        batch = prepare_views(batch, key, flags, params, out_size)

    images = jnp.concatenate(
        [batch["transformed_image1"], batch["transformed_image2"]], axis=0
    )

    def loss_fn(params):
        (_, proj), mutated = model.apply(
            {"params": params, "batch_stats": state.batch_stats},
            images,
            train=True,
            mutable=["batch_stats"],
        )
        loss, _ = contrastive_loss_from_projections(proj, batch, cfg, axis_name)
        return loss, (mutated["batch_stats"], proj)

    (loss, (new_batch_stats, proj)), grads = jax.value_and_grad(
        loss_fn, has_aux=True
    )(state.params)
    if axis_name is not None:
        grads = jax.lax.pmean(grads, axis_name)
        # Per-replica BN leaves each device with different running stats;
        # the returned state is declared replicated (out_specs=P()), so
        # make the persisted value deliberate: the cross-replica average
        # (equivalent to torch DDP's behavior in expectation; a no-op
        # when bn_axis_name already syncs the batch statistics).
        # Verified against a per-shard serial oracle in
        # tests/test_train.py::test_mesh_batch_stats_are_replica_mean.
        new_batch_stats = jax.tree.map(
            lambda s: jax.lax.pmean(s, axis_name), new_batch_stats
        )
    new_state = state.apply_gradients(grads=grads)
    new_state = new_state.replace(batch_stats=new_batch_stats)
    metrics = {"contrastive_loss": loss}
    if cfg.experiment_type in _EQUIVARIANT:
        # per-step raw-projection stats, logged by the reference's
        # equivariant family (peclr_model.py:43-46)
        metrics.update(projection_stats(proj, axis_name))
    return new_state, metrics


def make_train_step(
    model,
    cfg: ContrastiveConfig,
    mesh: Mesh | None = None,
    axis_name: str = DATA_AXIS,
    augment=None,
) -> Callable:
    """Builds the jitted train step.

    With a mesh: state replicated, batch sharded along ``axis_name``,
    global-batch contrastive semantics. Without: plain single-device jit.
    With ``augment=(AugmentFlags, AugmentParams, out_size)``: the step
    consumes raw uint8 crop batches and fuses the augmentation chain into
    the compiled program.
    """
    if mesh is None:
        # donate the state: params/opt-state buffers are updated in place,
        # halving HBM high-water and skipping a full-state copy per step.
        return jax.jit(
            partial(_step_fn, model=model, cfg=cfg, axis_name=None, augment=augment),
            donate_argnums=(0,),
        )

    sharded = shard_map(
        partial(_step_fn, model=model, cfg=cfg, axis_name=axis_name, augment=augment),
        mesh=mesh,
        in_specs=(P(), P(axis_name)),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(sharded, donate_argnums=(0,))


#: fixed seed for the deterministic validation augmentation (distinct
#: from the train step's key(0)-folded-with-step stream) — every epoch
#: sees the SAME val views, so contrastive_loss_val is comparable
#: across epochs.
EVAL_AUGMENT_SEED = 1729


def make_eval_step(
    model,
    cfg: ContrastiveConfig,
    mesh: Mesh | None = None,
    axis_name: str = DATA_AXIS,
    augment=None,
) -> Callable:
    """Validation step: frozen BN, loss only.

    With ``augment=(AugmentFlags, AugmentParams, out_size)`` the step
    consumes *raw* host batches (the ``--device_augment`` production
    path) and augments both views on-device with a FIXED key
    (EVAL_AUGMENT_SEED) — a deterministic eval route, so the fast path
    is no longer blind on validation (reference analog: ModelCheckpoint
    monitoring contrastive_loss, src/experiments/main.py:143-149).
    """

    def eval_fn(state, batch, axis: str | None):
        if augment is not None:
            from simhand_tpu.data.augment import prepare_views

            flags, params, out_size = augment
            key = jax.random.key(EVAL_AUGMENT_SEED)
            if axis is not None:
                key = jax.random.fold_in(key, jax.lax.axis_index(axis))
            batch = prepare_views(batch, key, flags, params, out_size)
        images = jnp.concatenate(
            [batch["transformed_image1"], batch["transformed_image2"]], axis=0
        )
        _, proj = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            images,
            train=False,
        )
        loss, _ = contrastive_loss_from_projections(proj, batch, cfg, axis)
        return {"contrastive_loss": loss}

    if mesh is None:
        return jax.jit(partial(eval_fn, axis=None))

    sharded = shard_map(
        partial(eval_fn, axis=axis_name),
        mesh=mesh,
        in_specs=(P(), P(axis_name)),
        out_specs=P(),
        check_vma=False,
    )
    return jax.jit(sharded)
