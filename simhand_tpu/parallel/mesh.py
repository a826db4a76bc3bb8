"""Device-mesh helpers.

The pre-training workload is pure data parallelism over the ICI mesh
(ResNet-scale model, global-batch contrastive loss): a 1-D "data" axis.
The contrastive losses all-gather the (2N, 128) projections over this axis
and psum/pmin/pmax the batch statistics, so the global similarity matrix
is computed row-sharded with zero redundancy (see simhand_tpu.losses).
"""
from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def create_mesh(devices=None, axis_name: str = DATA_AXIS) -> Mesh:
    """1-D data-parallel mesh over all (or the given) devices."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def batch_spec(axis_name: str = DATA_AXIS) -> P:
    """PartitionSpec sharding the leading (batch) axis."""
    return P(axis_name)


def replicate_spec() -> P:
    return P()


def shard_batch(mesh: Mesh, batch, axis_name: str = DATA_AXIS):
    """Places a host batch dict on the mesh, sharded along axis 0.

    Multi-host: each process passes its *local* slice of the global batch
    and the global array is assembled across processes (per-host input
    pipelines feed only their shard — DCN never sees activations).
    """
    sharding = NamedSharding(mesh, P(axis_name))
    if jax.process_count() > 1:
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(sharding, x),
            batch,
        )
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def replicate(mesh: Mesh, tree):
    """Replicates a pytree (params / state) over the mesh.

    Multi-host: every process holds the full value (states are built
    deterministically per process), so the replicated global array is
    assembled from identical process-local data.
    """
    sharding = NamedSharding(mesh, P())
    if jax.process_count() > 1:
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(
                sharding, np.asarray(x)
            ),
            tree,
        )
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def device_prefetch(iterator, mesh: Mesh | None, axis_name: str = DATA_AXIS,
                    depth: int = 2):
    """Double-buffers host batches onto the device(s).

    Batch n+1 transfers while batch n computes — hides host->HBM copy
    latency behind the step (the dispatch is async; the queue depth keeps
    the device fed).
    """
    import collections

    queue = collections.deque()

    def put(batch):
        if mesh is not None:
            return shard_batch(mesh, batch, axis_name)
        return jax.tree.map(jax.device_put, batch)

    for batch in iterator:
        queue.append(put(batch))
        if len(queue) >= depth:
            yield queue.popleft()
    while queue:
        yield queue.popleft()
