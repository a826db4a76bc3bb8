"""DetNet loss (reference: minimal-hand/losses/detloss.py).

  L = lambda_hm * sum_j 0.5 * MSE(hm_j * veil_j, hm_gt_j * veil_j)
    + lambda_dm * || (dm - dm_gt) * hm_tile ||_F / n_3d
    + lambda_lm * || (lm - lm_gt) * hm_tile ||_F / n_3d

3D terms are gated per-sample by flag_3d (2D-only datasets contribute only
the heatmap term). Implemented maskwise (no boolean indexing) so the whole
loss jits with static shapes.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def det_loss(
    preds: dict,
    hm_gt: Array,        # (N, 32, 32, 21)
    dm_gt: Array,        # (N, 32, 32, 21, 3)
    lm_gt: Array,        # (N, 32, 32, 21, 3)
    hm_veil: Array,      # (N, 21)
    flag_3d: Array,      # (N,)
    lambda_hm: float = 100.0,
    lambda_dm: float = 1.0,
    lambda_lm: float = 1.0,
    axis_name: str | None = None,
):
    """Returns ``(total, parts)``.

    Under a mesh (``axis_name`` set, per-shard batches), the dm/lm terms
    are sqrt-of-SUM norms, which do NOT shard-decompose: mean_k of
    per-shard norms ~= sqrt(world) x the global-batch norm, silently
    re-weighting the 100:1:1 loss balance with chip count. So the
    squared sums and the flagged count are psum'd to form the exact
    global-batch value on every shard. Gradients: each shard's grad of
    this global value is world x the single-device per-sample grad (the
    hm term's local-batch mean denominator, and psum's shard_map
    transpose, both duplicate cotangents across shards), so the
    trainer's pmean-of-gradients recovers the exact single-device
    gradient — verified in tests/test_finetune.py.
    """
    n = hm_gt.shape[0]
    j = hm_gt.shape[-1]

    # Heatmap: per-joint 0.5 * MSE over veiled maps, summed over joints.
    # (an equal-shard mean: per-shard value + pmean'd grads already equal
    # the global-batch semantics)
    veil = hm_veil.T[:, :, None]                          # (21, N, 1)
    pred = preds["h_map"].transpose(3, 0, 1, 2).reshape(j, n, -1)
    targ = hm_gt.transpose(3, 0, 1, 2).reshape(j, n, -1)
    per_joint_mse = jnp.mean((pred * veil - targ * veil) ** 2, axis=(1, 2))
    hm_loss = 0.5 * jnp.sum(per_joint_mse)

    # 3D maps: Frobenius norm over flagged samples / count of flagged.
    n3d_sum = jnp.sum(flag_3d)
    tile = hm_gt[..., None] * flag_3d.reshape(-1, 1, 1, 1, 1)  # (N,32,32,21,1)
    sq_dm = jnp.sum(((preds["d_map"] - dm_gt) * tile) ** 2)
    sq_lm = jnp.sum(((preds["l_map"] - lm_gt) * tile) ** 2)
    if axis_name is not None:
        n3d_sum = jax.lax.psum(n3d_sum, axis_name)
        sq_dm = jax.lax.psum(sq_dm, axis_name)
        sq_lm = jax.lax.psum(sq_lm, axis_name)
    n3d = jnp.maximum(n3d_sum, 1.0)
    dm_loss = jnp.sqrt(sq_dm) / n3d
    lm_loss = jnp.sqrt(sq_lm) / n3d

    total = lambda_hm * hm_loss + lambda_dm * dm_loss + lambda_lm * lm_loss
    return total, {
        "det_hm": hm_loss,
        "det_dm": dm_loss,
        "det_lm": lm_loss,
        "det_total": total,
    }
