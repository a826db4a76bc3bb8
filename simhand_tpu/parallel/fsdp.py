"""FSDP (ZeRO-3-style) parameter + optimizer-state sharding.

The pre-training workload is data-parallel by nature (SURVEY.md §2.10 —
the reference scales with Lightning ``strategy="dp"``, one full model
copy per GPU).  At reference scale (ResNet-152, global batch 8192, Adam
+ LARS) the replicated state is ~5x the parameter count in f32
(params + Adam mu/nu + LARS + f32 master copies), which caps the
per-chip batch long before the MXU does.  The TPU-native answer is not
a port of torch FSDP's wrapper machinery but GSPMD: annotate the state
pytree with ``NamedSharding``s that split each large leaf across the
mesh, jit the *global-semantics* step, and let XLA insert the
all-gather (params, fwd+bwd) and reduce-scatter (grads) collectives on
ICI — the scaling-book recipe.

Two mesh shapes are supported:

* 1-D ``("data",)`` — pure FSDP: batch and state both sharded over all
  chips.
* 2-D ``("data", "fsdp")`` — hybrid: the batch is sharded over *all*
  devices, state only over the trailing ``fsdp`` axis; each data-replica
  group holds one copy of every shard, so the param all-gathers ride the
  small fast axis while gradients all-reduce over the full mesh.

Semantics note: the step body here is the single-program
``_step_fn(axis_name=None)`` — BatchNorm statistics and the contrastive
loss see the GLOBAL batch (sync-BN), so an FSDP run is bit-comparable to
a single-device run on the same global batch (proven in
tests/test_fsdp.py) and differs from the shard_map path's per-replica BN
exactly the way ``bn_axis_name="data"`` does.

Why tp/pp/sp/ep are deliberately absent: see SCALING.md — a ResNet-50
at 25M params needs no tensor/pipeline split on any TPU topology this
framework targets, and the workload has no sequence or expert dimension.
"""
from __future__ import annotations

import math
from functools import partial
from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from simhand_tpu.parallel.mesh import DATA_AXIS

FSDP_AXIS = "fsdp"


def create_hybrid_mesh(n_data: int, n_fsdp: int, devices=None) -> Mesh:
    """2-D ``(data, fsdp)`` mesh: batch over both axes, state over fsdp."""
    if devices is None:
        devices = jax.devices()
    devices = np.asarray(devices[: n_data * n_fsdp]).reshape(n_data, n_fsdp)
    return Mesh(devices, (DATA_AXIS, FSDP_AXIS))


def leaf_partition_spec(shape, n_shards: int, axis_name: str,
                        min_leaf_elements: int = 4096) -> P:
    """FSDP rule for one array: shard the largest axis divisible by the
    mesh extent; leave small leaves (biases, BN scales, scalars)
    replicated — splitting them buys nothing and costs a collective."""
    if math.prod(shape) < min_leaf_elements:
        return P()
    divisible = [i for i, s in enumerate(shape) if s > 0 and s % n_shards == 0]
    if not divisible:
        return P()
    dim = max(divisible, key=lambda i: shape[i])
    spec: list[Any] = [None] * len(shape)
    spec[dim] = axis_name
    return P(*spec)


def fsdp_sharding(mesh: Mesh, tree, axis_name: str | None = None,
                  min_leaf_elements: int = 4096):
    """Pytree of ``NamedSharding``s implementing the FSDP layout.

    ``axis_name`` defaults to the mesh's trailing axis (``data`` on a 1-D
    mesh, ``fsdp`` on the hybrid mesh).
    """
    if axis_name is None:
        axis_name = mesh.axis_names[-1]
    n = mesh.shape[axis_name]

    def one(leaf):
        shape = getattr(leaf, "shape", ())
        return NamedSharding(
            mesh, leaf_partition_spec(shape, n, axis_name, min_leaf_elements)
        )

    return jax.tree.map(one, tree)


def _put_sharded(x, sharding):
    """device_put single-process; multi-host, each process carves its
    addressable shards out of the full host value (states are built
    deterministically per process, same as parallel.mesh.replicate)."""
    if jax.process_count() > 1:
        arr = np.asarray(x)
        return jax.make_array_from_callback(
            arr.shape, sharding, lambda idx: arr[idx]
        )
    return jax.device_put(x, sharding)


def shard_state(mesh: Mesh, state, axis_name: str | None = None):
    """Places a (host or replicated) train state in the FSDP layout."""
    shardings = fsdp_sharding(mesh, state, axis_name)
    return jax.tree.map(_put_sharded, state, shardings)


def make_fsdp_train_step(model, cfg, mesh: Mesh, state, augment=None):
    """Jits the full pre-training step with FSDP in/out shardings.

    ``state`` is a freshly built (host / single-device) train state used
    to derive the sharding pytree.  Returns ``(step, place_state,
    place_batch)``: the jitted step plus the placement helpers that put
    a state / host batch into the layouts the step expects.  The state
    argument is donated — the sharded buffers update in place, so the
    per-chip high-water is ``|state|/n + activations``.
    """
    from simhand_tpu.train.loop import _step_fn

    state_shardings = fsdp_sharding(mesh, state)
    batch_sharding = NamedSharding(mesh, P(tuple(mesh.axis_names)))
    replicated = NamedSharding(mesh, P())

    def place_state(s):
        return jax.tree.map(_put_sharded, s, state_shardings)

    def place_batch(batch):
        # multi-host: each process passes only its LOCAL slice of the
        # global batch, assembled the same way as parallel.mesh.shard_batch
        if jax.process_count() > 1:
            return jax.tree.map(
                lambda x: jax.make_array_from_process_local_data(
                    batch_sharding, np.asarray(x)
                ),
                batch,
            )
        return jax.tree.map(lambda x: jax.device_put(x, batch_sharding), batch)

    step = jax.jit(
        partial(_step_fn, model=model, cfg=cfg, axis_name=None,
                augment=augment),
        in_shardings=(state_shardings, batch_sharding),
        # metrics replicate (scalars); the new state keeps the FSDP
        # layout, which also lets the donated input buffers be reused.
        out_shardings=(state_shardings, replicated),
        donate_argnums=(0,),
    )
    return step, place_state, place_batch
