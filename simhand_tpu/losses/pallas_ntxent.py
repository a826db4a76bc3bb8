"""Pallas TPU kernels for the contrastive hot path.

At global batch 8192 each device owns a (2B_local, 2N) = (2048, 16384)
row-shard of the similarity problem. The XLA path materializes three such
planes in HBM (pairwise joint-distance matrix, weight matrix, covariance)
plus a 21-iteration accumulation loop — ~5+ GB of HBM traffic per step.
These kernels keep everything in VMEM per tile:

``ntxent_denominator``
    neg_i = sum_{j != i} exp(z_i . z_j / T)                     (plain)

``weighted_ntxent_denominator``
    d_ij  = mean_k ||j_i^k - j_j^k||          (mpjpe over 21 joints)
    w_ij  = (d_max - d_ij) / (d_max - d_min)  (linear inverted weights)
    neg_i = sum_{j != i} exp(z_i . z_j * w_ij / T)

One MXU matmul per (row, col) tile for the covariance; the joint-distance
reduction runs as a 21-step VPU loop on VMEM-resident tiles; exp + mask +
row-sum fuse in the same tile before a single (rows,) accumulation write.

Both kernels are forward-only (the production train path uses the XLA
implementation in losses/contrastive.py, which autodiffs; these serve the
mining/eval paths and as the template for a custom-VJP training kernel).
Numerics are validated against the reference implementation in
tests/test_pallas_ntxent.py (interpret mode on CPU, compiled on TPU).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

ROW_TILE = 256
COL_TILE = 512
# the weighted kernel carries ~21 unrolled (rows, cols) distance
# temporaries in VMEM — smaller tiles keep it under the 16 MB budget
W_ROW_TILE = 128
W_COL_TILE = 256


def _ntxent_denom_kernel(rows_ref, cols_ref, row_ids_ref, temp_ref,
                         out_ref, acc_ref):
    j = pl.program_id(1)
    n_j = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    cov = jnp.dot(
        rows_ref[:], cols_ref[:].T, preferred_element_type=jnp.float32
    )
    sim = jnp.exp(cov / temp_ref[0])

    # mask the self-similarity diagonal: global col id == row id
    col_start = j * cols_ref.shape[0]
    col_ids = col_start + jax.lax.broadcasted_iota(
        jnp.int32, sim.shape, dimension=1
    )
    is_self = col_ids == row_ids_ref[:]          # row_ids block is (R, 1)
    sim = jnp.where(is_self, 0.0, sim)

    acc_ref[:] += jnp.sum(sim, axis=1, keepdims=True)

    @pl.when(j == n_j - 1)
    def _():
        out_ref[:] = acc_ref[:]


@functools.partial(jax.jit, static_argnames=("interpret",))
def ntxent_denominator(
    z_rows: Array,      # (M, D) local rows, L2-normalized
    z_cols: Array,      # (N, D) global columns
    row_ids: Array,     # (M,) global ids of the rows (for self-masking)
    temperature: float = 0.5,
    interpret: bool = False,
) -> Array:
    M, D = z_rows.shape
    N = z_cols.shape[0]
    assert M % ROW_TILE == 0 and N % COL_TILE == 0, (M, N)

    grid = (M // ROW_TILE, N // COL_TILE)
    out = pl.pallas_call(
        _ntxent_denom_kernel,
        out_shape=jax.ShapeDtypeStruct((M, 1), jnp.float32),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=grid,
            in_specs=[
                pl.BlockSpec((ROW_TILE, D), lambda i, j: (i, 0)),
                pl.BlockSpec((COL_TILE, D), lambda i, j: (j, 0)),
                pl.BlockSpec((ROW_TILE, 1), lambda i, j: (i, 0)),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec((ROW_TILE, 1), lambda i, j: (i, 0)),
            scratch_shapes=[pltpu.VMEM((ROW_TILE, 1), jnp.float32)],
        ),
        interpret=interpret,
    )(z_rows, z_cols, row_ids.astype(jnp.int32).reshape(M, 1),
      jnp.full((1,), temperature, jnp.float32))
    return out[:, 0]


def _weighted_denom_kernel(rows_ref, cols_ref, jrows_ref, jcols_ref,
                           row_ids_ref, scalars_ref, out_ref, acc_ref):
    j = pl.program_id(1)
    n_j = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    temp = scalars_ref[0]
    d_max = scalars_ref[1]
    d_min = scalars_ref[2]

    cov = jnp.dot(
        rows_ref[:], cols_ref[:].T, preferred_element_type=jnp.float32
    )

    # mpjpe distance tile: statically unrolled 21-joint VPU accumulation,
    # all VMEM-resident (static indices — pallas TPU has no dynamic_slice).
    jr = jrows_ref[:]                     # (ROW_TILE, 42) [x0,y0,x1,y1,...]
    jc = jcols_ref[:]                     # (COL_TILE, 42)

    dist = jnp.zeros(cov.shape, jnp.float32)
    for k in range(21):
        dx = jr[:, 2 * k][:, None] - jc[:, 2 * k][None, :]
        dy = jr[:, 2 * k + 1][:, None] - jc[:, 2 * k + 1][None, :]
        dist = dist + jnp.sqrt(dx * dx + dy * dy)
    dist = dist * (1.0 / 21.0)
    w = (d_max - dist) / (d_max - d_min)

    sim = jnp.exp(cov * w / temp)
    col_start = j * cols_ref.shape[0]
    col_ids = col_start + jax.lax.broadcasted_iota(
        jnp.int32, sim.shape, dimension=1
    )
    sim = jnp.where(col_ids == row_ids_ref[:], 0.0, sim)

    acc_ref[:] += jnp.sum(sim, axis=1, keepdims=True)

    @pl.when(j == n_j - 1)
    def _():
        out_ref[:] = acc_ref[:]


@functools.partial(jax.jit, static_argnames=("interpret",))
def weighted_ntxent_denominator(
    z_rows: Array,        # (M, D)
    z_cols: Array,        # (N, D)
    joints_rows: Array,   # (M, 21, 2)
    joints_cols: Array,   # (N, 21, 2)
    row_ids: Array,       # (M,)
    d_max: Array,         # scalar: global max of the distance matrix
    d_min: Array,         # scalar: global min
    temperature: float = 0.5,
    interpret: bool = False,
) -> Array:
    M, D = z_rows.shape
    N = z_cols.shape[0]
    assert M % W_ROW_TILE == 0 and N % W_COL_TILE == 0, (M, N)

    jr = joints_rows.reshape(M, 42)
    jc = joints_cols.reshape(N, 42)
    scalars = jnp.stack(
        [jnp.float32(temperature), d_max.astype(jnp.float32),
         d_min.astype(jnp.float32)]
    )

    grid = (M // W_ROW_TILE, N // W_COL_TILE)
    out = pl.pallas_call(
        _weighted_denom_kernel,
        out_shape=jax.ShapeDtypeStruct((M, 1), jnp.float32),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=grid,
            in_specs=[
                pl.BlockSpec((W_ROW_TILE, D), lambda i, j: (i, 0)),
                pl.BlockSpec((W_COL_TILE, D), lambda i, j: (j, 0)),
                pl.BlockSpec((W_ROW_TILE, 42), lambda i, j: (i, 0)),
                pl.BlockSpec((W_COL_TILE, 42), lambda i, j: (j, 0)),
                pl.BlockSpec((W_ROW_TILE, 1), lambda i, j: (i, 0)),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec((W_ROW_TILE, 1), lambda i, j: (i, 0)),
            scratch_shapes=[pltpu.VMEM((W_ROW_TILE, 1), jnp.float32)],
        ),
        interpret=interpret,
    )(z_rows, z_cols, jr, jc, row_ids.astype(jnp.int32).reshape(M, 1),
      scalars)
    return out[:, 0]


# --------------------------------------------------------------------------
# Full NT-Xent loss with custom VJP (training path)
# --------------------------------------------------------------------------

def _ntxent_grad_kernel(rows_ref, cols_ref, inv_rows_ref, inv_cols_ref,
                        row_ids_ref, temp_ref, out_ref, acc_ref):
    """G_m = sum_{j != m} s_mj * (1/neg_m + 1/neg_j) * z_j, tiled.

    s is symmetric for a shared z set, so one streaming pass produces the
    full denominator gradient; the positive-pair term is added outside.
    """
    j = pl.program_id(1)
    n_j = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    cov = jnp.dot(
        rows_ref[:], cols_ref[:].T, preferred_element_type=jnp.float32
    )
    s = jnp.exp(cov / temp_ref[0])
    w = s * (inv_rows_ref[:] + inv_cols_ref[:].reshape(1, -1))
    col_start = j * cols_ref.shape[0]
    col_ids = col_start + jax.lax.broadcasted_iota(
        jnp.int32, w.shape, dimension=1
    )
    w = jnp.where(col_ids == row_ids_ref[:], 0.0, w)
    acc_ref[:] += jnp.dot(w, cols_ref[:], preferred_element_type=jnp.float32)

    @pl.when(j == n_j - 1)
    def _():
        out_ref[:] = acc_ref[:]


@functools.partial(jax.jit, static_argnames=("interpret",))
def _ntxent_grad(z_rows: Array, z_cols: Array, inv_rows: Array,
                 inv_cols: Array, row_ids: Array, temperature: float,
                 interpret: bool = False) -> Array:
    """Denominator gradient for the given rows against global cols."""
    M, D = z_rows.shape
    N = z_cols.shape[0]
    assert M % ROW_TILE == 0 and N % COL_TILE == 0, (M, N)
    grid = (M // ROW_TILE, N // COL_TILE)
    return pl.pallas_call(
        _ntxent_grad_kernel,
        out_shape=jax.ShapeDtypeStruct((M, D), jnp.float32),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=grid,
            in_specs=[
                pl.BlockSpec((ROW_TILE, D), lambda i, j: (i, 0)),
                pl.BlockSpec((COL_TILE, D), lambda i, j: (j, 0)),
                pl.BlockSpec((ROW_TILE, 1), lambda i, j: (i, 0)),
                pl.BlockSpec((COL_TILE, 1), lambda i, j: (j, 0)),
                pl.BlockSpec((ROW_TILE, 1), lambda i, j: (i, 0)),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec((ROW_TILE, D), lambda i, j: (i, 0)),
            scratch_shapes=[pltpu.VMEM((ROW_TILE, D), jnp.float32)],
        ),
        interpret=interpret,
    )(z_rows, z_cols, inv_rows.reshape(M, 1), inv_cols.reshape(N, 1),
      row_ids.astype(jnp.int32).reshape(M, 1),
      jnp.full((1,), temperature, jnp.float32))


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def nt_xent_pallas(z1: Array, z2: Array, temperature: float = 0.5,
                   interpret: bool = False) -> Array:
    """SimCLR NT-Xent with pallas forward AND backward.

    Semantics identical to losses.contrastive.nt_xent (single-device):
    the (2N, 2N) similarity matrix never materializes in HBM in either
    pass. z1/z2 must be L2-normalized (B, D) with B*2 divisible by the
    tile sizes.
    """
    loss, _ = _nt_xent_pallas_fwd(z1, z2, temperature, interpret)
    return loss


def _nt_xent_pallas_fwd(z1, z2, temperature, interpret):
    z = jnp.concatenate([z1, z2], axis=0)
    n = z.shape[0]
    neg = ntxent_denominator(
        z, z, jnp.arange(n, dtype=jnp.int32), temperature, interpret=interpret
    )
    pos = jnp.sum(z1 * z2, axis=-1) / temperature
    pos2 = jnp.concatenate([pos, pos])
    loss = jnp.mean(jnp.log(neg) - pos2)
    return loss, (z1, z2, neg)


def _nt_xent_pallas_bwd(temperature, interpret, res, g):
    z1, z2, neg = res
    b = z1.shape[0]
    n = 2 * b
    z = jnp.concatenate([z1, z2], axis=0)
    ids = jnp.arange(n, dtype=jnp.int32)
    denom_grad = _ntxent_grad(
        z, z, 1.0 / neg, 1.0 / neg, ids, temperature, interpret=interpret
    )
    # dL/dz_m = (1/(2N T)) * [denom_grad_m - 2 * z_partner(m)]
    partner = jnp.concatenate([z2, z1], axis=0)
    dz = (denom_grad - 2.0 * partner) / (n * temperature)
    dz = dz * g
    return dz[:b], dz[b:]


nt_xent_pallas.defvjp(_nt_xent_pallas_fwd, _nt_xent_pallas_bwd)


# --------------------------------------------------------------------------
# Weighted NT-Xent (the simhand_w flagship loss) with custom VJP
# --------------------------------------------------------------------------

def _weighted_grad_kernel(rows_ref, cols_ref, jrows_ref, jcols_ref,
                          inv_rows_ref, inv_cols_ref, row_ids_ref,
                          scalars_ref, out_ref, acc_ref):
    """G_m = sum_{j != m} exp(c_mj w_mj / T) * w_mj *
             (1/neg_m + 1/neg_j) * z_j, with w recomputed in-tile.

    Weights depend only on the (fixed) joints, so the z-gradient treats
    them as constants; w is symmetric, so one streaming pass suffices.
    """
    j = pl.program_id(1)
    n_j = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    temp = scalars_ref[0]
    d_max = scalars_ref[1]
    d_min = scalars_ref[2]

    cov = jnp.dot(
        rows_ref[:], cols_ref[:].T, preferred_element_type=jnp.float32
    )
    jr = jrows_ref[:]
    jc = jcols_ref[:]
    dist = jnp.zeros(cov.shape, jnp.float32)
    for k in range(21):
        dx = jr[:, 2 * k][:, None] - jc[:, 2 * k][None, :]
        dy = jr[:, 2 * k + 1][:, None] - jc[:, 2 * k + 1][None, :]
        dist = dist + jnp.sqrt(dx * dx + dy * dy)
    w = (d_max - dist * (1.0 / 21.0)) / (d_max - d_min)

    g = jnp.exp(cov * w / temp) * w * (
        inv_rows_ref[:] + inv_cols_ref[:].reshape(1, -1)
    )
    col_start = j * cols_ref.shape[0]
    col_ids = col_start + jax.lax.broadcasted_iota(
        jnp.int32, g.shape, dimension=1
    )
    g = jnp.where(col_ids == row_ids_ref[:], 0.0, g)
    acc_ref[:] += jnp.dot(g, cols_ref[:], preferred_element_type=jnp.float32)

    @pl.when(j == n_j - 1)
    def _():
        out_ref[:] = acc_ref[:]


def _weighted_grad(z, joints, inv_neg, d_max, d_min, temperature,
                   interpret=False):
    N = z.shape[0]
    ids = jnp.arange(N, dtype=jnp.int32)
    return _weighted_grad_rows(
        z, z, joints, joints, inv_neg, inv_neg, ids, d_max, d_min,
        temperature, interpret=interpret,
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def weighted_nt_xent_pallas(z1, z2, joints, pos_weights, pos_neg_minmax,
                            temperature: float = 0.5,
                            interpret: bool = False):
    """simhand_w weighted NT-Xent, pallas fwd+bwd, HBM-matrix-free.

    Args:
      z1, z2: (B, D) normalized projections.
      joints: (2B, 21, 2) stacked [joints1; joints2] (the _aug or _ori
        2D joints used for the weights).
      pos_weights: (B,) positive-pair weights (cheap; computed outside).
      pos_neg_minmax: (2,) array [d_max, d_min] — global batch statistics
        of the pairwise distance matrix (pmin/pmax under sharding).

    Gradients flow to z1/z2 only (weights are joint statistics).
    """
    loss, _ = _weighted_pallas_fwd(z1, z2, joints, pos_weights,
                                   pos_neg_minmax, temperature, interpret)
    return loss


def _weighted_pallas_fwd(z1, z2, joints, pos_weights, pos_neg_minmax,
                         temperature, interpret):
    z = jnp.concatenate([z1, z2], axis=0)
    n = z.shape[0]
    d_max, d_min = pos_neg_minmax[0], pos_neg_minmax[1]
    neg = weighted_ntxent_denominator(
        z, z, joints, joints, jnp.arange(n, dtype=jnp.int32),
        d_max, d_min, temperature, interpret=interpret,
    )
    pos = jnp.sum(z1 * z2, axis=-1) * pos_weights / temperature
    pos2 = jnp.concatenate([pos, pos])
    loss = jnp.mean(jnp.log(neg) - pos2)
    return loss, (z1, z2, joints, pos_weights, pos_neg_minmax, neg)


def _weighted_pallas_bwd(temperature, interpret, res, g):
    z1, z2, joints, pos_weights, pos_neg_minmax, neg = res
    b = z1.shape[0]
    n = 2 * b
    z = jnp.concatenate([z1, z2], axis=0)
    denom_grad = _weighted_grad(
        z, joints, 1.0 / neg, pos_neg_minmax[0], pos_neg_minmax[1],
        temperature, interpret=interpret,
    )
    partner = jnp.concatenate([z2, z1], axis=0)
    pw2 = jnp.concatenate([pos_weights, pos_weights])[:, None]
    dz = (denom_grad - 2.0 * pw2 * partner) / (n * temperature)
    dz = dz * g
    return dz[:b], dz[b:], None, None, None


weighted_nt_xent_pallas.defvjp(_weighted_pallas_fwd, _weighted_pallas_bwd)


# --------------------------------------------------------------------------
# Sharded (global-batch) pallas NT-Xent: rows local, columns all-gathered
# --------------------------------------------------------------------------

def make_sharded_nt_xent_pallas(axis_name: str, temperature: float = 0.5,
                                interpret: bool = False):
    """Global-batch NT-Xent where every device streams its row-shard
    against the all-gathered column set through the pallas kernels —
    forward AND backward — without ever materializing a (2N, 2N) plane.

    Returns a function (z1_local, z2_local) -> scalar loss for use inside
    shard_map over ``axis_name``. Semantics match losses.contrastive.
    nt_xent(axis_name=...); per-row gradients are complete locally (the
    similarity matrix is symmetric, so the row pass with global 1/neg
    captures both the row and column contributions) — no gradient psum.
    """

    @jax.custom_vjp
    def loss_fn(z1, z2):
        loss, _ = fwd(z1, z2)
        return loss

    def _gather_state(z1, z2):
        b = z1.shape[0]
        idx = jax.lax.axis_index(axis_name)
        world = jax.lax.axis_size(axis_name)
        n_global = b * world
        z_local = jnp.concatenate([z1, z2], axis=0)
        z1_all = jax.lax.all_gather(z1, axis_name, axis=0, tiled=True)
        z2_all = jax.lax.all_gather(z2, axis_name, axis=0, tiled=True)
        z_cols = jnp.concatenate([z1_all, z2_all], axis=0)
        local = jnp.arange(b, dtype=jnp.int32)
        row_ids = jnp.concatenate(
            [local + idx * b, local + idx * b + n_global]
        )
        return z_local, z_cols, row_ids

    def fwd(z1, z2):
        z_local, z_cols, row_ids = _gather_state(z1, z2)
        neg_local = ntxent_denominator(
            z_local, z_cols, row_ids, temperature, interpret=interpret
        )
        pos = jnp.sum(z1 * z2, axis=-1) / temperature
        pos2 = jnp.concatenate([pos, pos])
        loss = jax.lax.pmean(
            jnp.mean(jnp.log(neg_local) - pos2), axis_name
        )
        return loss, (z1, z2, neg_local)

    def bwd(res, g):
        z1, z2, neg_local = res
        b = z1.shape[0]
        world = jax.lax.axis_size(axis_name)
        n_global = 2 * b * world
        z_local, z_cols, row_ids = _gather_state(z1, z2)
        # global 1/neg, ordered like the columns ([neg1_all; neg2_all])
        inv_local = 1.0 / neg_local
        inv1 = jax.lax.all_gather(inv_local[:b], axis_name, axis=0, tiled=True)
        inv2 = jax.lax.all_gather(inv_local[b:], axis_name, axis=0, tiled=True)
        inv_cols = jnp.concatenate([inv1, inv2])
        denom_grad = _ntxent_grad(
            z_local, z_cols, inv_local, inv_cols, row_ids, temperature,
            interpret=interpret,
        )
        partner = jnp.concatenate([z2, z1], axis=0)
        dz = (denom_grad - 2.0 * partner) / (n_global * temperature)
        dz = dz * g
        return dz[:b], dz[b:]

    loss_fn.defvjp(fwd, bwd)
    return loss_fn


def make_sharded_weighted_nt_xent_pallas(axis_name: str,
                                         temperature: float = 0.5,
                                         interpret: bool = False):
    """Global-batch simhand_w loss (linear/mpjpe pos_neg weighting)
    entirely through the pallas kernels under shard_map: columns, joints
    and 1/neg are all-gathered; rows stream locally in fwd AND bwd.

    Returned fn signature: (z1, z2, joints1, joints2) -> loss, where
    joints are the (B_local, 21, 2) 2D keypoints of each view. Matches
    losses.weighted_nt_xent(+linear_weights) with axis_name semantics.
    """

    def _stats(j_local_rows, j_cols):
        # streaming global min/max of the pairwise mpjpe matrix:
        # local rows x global cols, pmin/pmax over the mesh
        from simhand_tpu.losses.weights import _pairwise_matrix

        d = _pairwise_matrix(j_local_rows, j_cols, "mpjpe")
        return (
            jax.lax.pmin(jnp.min(d), axis_name),
            jax.lax.pmax(jnp.max(d), axis_name),
        )

    @jax.custom_vjp
    def loss_fn(z1, z2, j1, j2):
        loss, _ = fwd(z1, z2, j1, j2)
        return loss

    def _gather(z1, z2, j1, j2):
        b = z1.shape[0]
        idx = jax.lax.axis_index(axis_name)
        world = jax.lax.axis_size(axis_name)
        n_global = b * world

        def gcat(a, c):
            aa = jax.lax.all_gather(a, axis_name, axis=0, tiled=True)
            cc = jax.lax.all_gather(c, axis_name, axis=0, tiled=True)
            return jnp.concatenate([aa, cc], axis=0)

        z_local = jnp.concatenate([z1, z2], axis=0)
        j_local = jnp.concatenate([j1, j2], axis=0)
        z_cols = gcat(z1, z2)
        j_cols = gcat(j1, j2)
        local = jnp.arange(b, dtype=jnp.int32)
        row_ids = jnp.concatenate(
            [local + idx * b, local + idx * b + n_global]
        )
        return z_local, j_local, z_cols, j_cols, row_ids

    def fwd(z1, z2, j1, j2):
        from simhand_tpu.losses.weights import _pair_distance

        b = z1.shape[0]
        z_local, j_local, z_cols, j_cols, row_ids = _gather(z1, z2, j1, j2)
        d_min, d_max = _stats(j_local, j_cols)

        neg_local = weighted_ntxent_denominator(
            z_local, z_cols, j_local, j_cols, row_ids, d_max, d_min,
            temperature, interpret=interpret,
        )
        pos_d = _pair_distance(j1, j2, "mpjpe")
        p_min = jax.lax.pmin(jnp.min(pos_d), axis_name)
        p_max = jax.lax.pmax(jnp.max(pos_d), axis_name)
        pw = (p_max - pos_d) / (p_max - p_min)
        pos = jnp.sum(z1 * z2, axis=-1) * pw / temperature
        pos2 = jnp.concatenate([pos, pos])
        loss = jax.lax.pmean(jnp.mean(jnp.log(neg_local) - pos2), axis_name)
        return loss, (z1, z2, j1, j2, neg_local, pw, d_min, d_max)

    def bwd(res, g):
        z1, z2, j1, j2, neg_local, pw, d_min, d_max = res
        b = z1.shape[0]
        world = jax.lax.axis_size(axis_name)
        n_global = 2 * b * world
        z_local, j_local, z_cols, j_cols, row_ids = _gather(z1, z2, j1, j2)
        inv_local = 1.0 / neg_local
        inv1 = jax.lax.all_gather(inv_local[:b], axis_name, axis=0, tiled=True)
        inv2 = jax.lax.all_gather(inv_local[b:], axis_name, axis=0, tiled=True)
        inv_cols = jnp.concatenate([inv1, inv2])

        denom_grad = _weighted_grad_rows(
            z_local, z_cols, j_local, j_cols, inv_local, inv_cols, row_ids,
            d_max, d_min, temperature, interpret=interpret,
        )
        partner = jnp.concatenate([z2, z1], axis=0)
        pw2 = jnp.concatenate([pw, pw])[:, None]
        dz = (denom_grad - 2.0 * pw2 * partner) / (n_global * temperature)
        dz = dz * g
        return dz[:b], dz[b:], None, None

    loss_fn.defvjp(fwd, bwd)
    return loss_fn


@functools.partial(jax.jit, static_argnames=("interpret",))
def _weighted_grad_rows(z_rows, z_cols, j_rows, j_cols, inv_rows, inv_cols,
                        row_ids, d_max, d_min, temperature,
                        interpret=False):
    """Weighted denominator gradient for given rows vs global cols."""
    M, D = z_rows.shape
    N = z_cols.shape[0]
    assert M % W_ROW_TILE == 0 and N % W_COL_TILE == 0, (M, N)
    scalars = jnp.stack(
        [jnp.float32(temperature), d_max.astype(jnp.float32),
         d_min.astype(jnp.float32)]
    )
    grid = (M // W_ROW_TILE, N // W_COL_TILE)
    return pl.pallas_call(
        _weighted_grad_kernel,
        out_shape=jax.ShapeDtypeStruct((M, D), jnp.float32),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=grid,
            in_specs=[
                pl.BlockSpec((W_ROW_TILE, D), lambda i, j: (i, 0)),
                pl.BlockSpec((W_COL_TILE, D), lambda i, j: (j, 0)),
                pl.BlockSpec((W_ROW_TILE, 42), lambda i, j: (i, 0)),
                pl.BlockSpec((W_COL_TILE, 42), lambda i, j: (j, 0)),
                pl.BlockSpec((W_ROW_TILE, 1), lambda i, j: (i, 0)),
                pl.BlockSpec((W_COL_TILE, 1), lambda i, j: (j, 0)),
                pl.BlockSpec((W_ROW_TILE, 1), lambda i, j: (i, 0)),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec((W_ROW_TILE, D), lambda i, j: (i, 0)),
            scratch_shapes=[pltpu.VMEM((W_ROW_TILE, D), jnp.float32)],
        ),
        interpret=interpret,
    )(z_rows, z_cols, j_rows.reshape(M, 42), j_cols.reshape(N, 42),
      inv_rows.reshape(M, 1), inv_cols.reshape(N, 1),
      row_ids.astype(jnp.int32).reshape(M, 1), scalars)
