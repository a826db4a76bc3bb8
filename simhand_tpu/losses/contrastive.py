"""Contrastive (NT-Xent) losses, global-batch sharding-aware.

Replicates the reference formulas exactly in the single-device regime
(reference: src/models/utils.py:157-189 `vanila_contrastive_loss`,
:391-427 `vanila_weights_contrastive_loss`, :430-465 pos-only,
:468-501 neg-only), and extends them to the *global* negative set when run
inside ``shard_map`` over a mesh axis: projections are all-gathered over
ICI (cheap — (2N, 128) activations), each device computes its row-shard of
the (2N, 2N) similarity matrix on the MXU, and the final mean is a
``pmean``. With equal per-device shards this is bitwise the same math as
the single-device full-batch computation.

Reference quirks preserved on purpose:
  * only the self-similarity diagonal is excluded from the denominator —
    the positive pair stays in the negative sum;
  * in the weighted variants the element-wise neg-weighting is applied to
    the *whole* covariance matrix before exp (positives included).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array

_MATMUL_PREC = jax.lax.Precision.HIGHEST


def _row_col_ids(n_local: int, axis_name: str | None):
    """Global row ids of the local [z1; z2] rows and all global column ids.

    Global ordering is [z1_dev0; z1_dev1; ...; z2_dev0; z2_dev1; ...] —
    i.e. the all-gathered z1 block followed by the all-gathered z2 block,
    matching ``z = concat([z1, z2])`` on a single device.
    """
    if axis_name is None:
        rows = jnp.arange(2 * n_local)
        return rows, rows
    idx = jax.lax.axis_index(axis_name)
    world = jax.lax.axis_size(axis_name)
    n_global = n_local * world
    local = jnp.arange(n_local)
    rows = jnp.concatenate([local + idx * n_local, local + idx * n_local + n_global])
    cols = jnp.arange(2 * n_global)
    return rows, cols


def _gather_z(z1: Array, z2: Array, axis_name: str | None):
    """Local rows (2B, D) and global columns (2N, D) of the z matrix."""
    z_local = jnp.concatenate([z1, z2], axis=0)
    if axis_name is None:
        return z_local, z_local
    z1_all = jax.lax.all_gather(z1, axis_name, axis=0, tiled=True)
    z2_all = jax.lax.all_gather(z2, axis_name, axis=0, tiled=True)
    return z_local, jnp.concatenate([z1_all, z2_all], axis=0)


def _mean_over_rows(x: Array, axis_name: str | None) -> Array:
    m = jnp.mean(x)
    if axis_name is not None:
        m = jax.lax.pmean(m, axis_name)
    return m


def nt_xent(
    z1: Array,
    z2: Array,
    temperature: float = 0.5,
    axis_name: str | None = None,
) -> Array:
    """SimCLR NT-Xent over the (global) batch.

    Args:
      z1, z2: (B_local, D) L2-normalized projections of the two views.
      temperature: softmax temperature.
      axis_name: mesh axis to all-gather negatives over (None = local).

    Returns:
      scalar loss.
    """
    z_local, z_global = _gather_z(z1, z2, axis_name)
    rows, cols = _row_col_ids(z1.shape[0], axis_name)

    cov = jnp.dot(z_local, z_global.T, precision=_MATMUL_PREC) / temperature
    sim = jnp.exp(cov)
    diag = rows[:, None] == cols[None, :]
    neg = jnp.sum(jnp.where(diag, 0.0, sim), axis=-1)

    pos = jnp.exp(jnp.sum(z1 * z2, axis=-1) / temperature)
    pos = jnp.concatenate([pos, pos], axis=0)
    return _mean_over_rows(-jnp.log(pos / neg), axis_name)


def weighted_nt_xent(
    z1: Array,
    z2: Array,
    pos_weights: Array,
    neg_weights: Array,
    temperature: float = 0.5,
    axis_name: str | None = None,
) -> Array:
    """NT-Xent with similarity-adaptive positive AND negative weights.

    Args:
      z1, z2: (B_local, D) normalized projections.
      pos_weights: (B_local,) per-pair positive weights.
      neg_weights: (2*B_local, 2*N_global) row-shard of the full negative
        weight matrix (local rows x global columns).
      axis_name: mesh axis for the global negative set.
    """
    z_local, z_global = _gather_z(z1, z2, axis_name)
    rows, cols = _row_col_ids(z1.shape[0], axis_name)

    cov = jnp.dot(z_local, z_global.T, precision=_MATMUL_PREC)
    sim = jnp.exp(cov * neg_weights / temperature)
    diag = rows[:, None] == cols[None, :]
    neg = jnp.sum(jnp.where(diag, 0.0, sim), axis=-1)

    pos = jnp.exp(jnp.sum(z1 * z2, axis=-1) * pos_weights / temperature)
    pos = jnp.concatenate([pos, pos], axis=0)
    return _mean_over_rows(-jnp.log(pos / neg), axis_name)


def pos_weighted_nt_xent(
    z1: Array,
    z2: Array,
    pos_weights: Array,
    temperature: float = 0.5,
    axis_name: str | None = None,
) -> Array:
    """NT-Xent with positive-pair weights only (``--pos_neg pos``)."""
    z_local, z_global = _gather_z(z1, z2, axis_name)
    rows, cols = _row_col_ids(z1.shape[0], axis_name)

    cov = jnp.dot(z_local, z_global.T, precision=_MATMUL_PREC)
    sim = jnp.exp(cov / temperature)
    diag = rows[:, None] == cols[None, :]
    neg = jnp.sum(jnp.where(diag, 0.0, sim), axis=-1)

    pos = jnp.exp(jnp.sum(z1 * z2, axis=-1) * pos_weights / temperature)
    pos = jnp.concatenate([pos, pos], axis=0)
    return _mean_over_rows(-jnp.log(pos / neg), axis_name)


def neg_weighted_nt_xent(
    z1: Array,
    z2: Array,
    neg_weights: Array,
    temperature: float = 0.5,
    axis_name: str | None = None,
) -> Array:
    """NT-Xent with negative-matrix weights only (``--pos_neg neg``)."""
    z_local, z_global = _gather_z(z1, z2, axis_name)
    rows, cols = _row_col_ids(z1.shape[0], axis_name)

    cov = jnp.dot(z_local, z_global.T, precision=_MATMUL_PREC)
    sim = jnp.exp(cov * neg_weights / temperature)
    diag = rows[:, None] == cols[None, :]
    neg = jnp.sum(jnp.where(diag, 0.0, sim), axis=-1)

    pos = jnp.exp(jnp.sum(z1 * z2, axis=-1) / temperature)
    pos = jnp.concatenate([pos, pos], axis=0)
    return _mean_over_rows(-jnp.log(pos / neg), axis_name)
