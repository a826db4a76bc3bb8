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
):
    n = hm_gt.shape[0]
    j = hm_gt.shape[-1]

    # Heatmap: per-joint 0.5 * MSE over veiled maps, summed over joints.
    veil = hm_veil.T[:, :, None]                          # (21, N, 1)
    pred = preds["h_map"].transpose(3, 0, 1, 2).reshape(j, n, -1)
    targ = hm_gt.transpose(3, 0, 1, 2).reshape(j, n, -1)
    per_joint_mse = jnp.mean((pred * veil - targ * veil) ** 2, axis=(1, 2))
    hm_loss = 0.5 * jnp.sum(per_joint_mse)

    # 3D maps: Frobenius norm over flagged samples / count of flagged.
    n3d = jnp.maximum(jnp.sum(flag_3d), 1.0)
    tile = hm_gt[..., None] * flag_3d.reshape(-1, 1, 1, 1, 1)  # (N,32,32,21,1)
    dm_loss = jnp.sqrt(jnp.sum(((preds["d_map"] - dm_gt) * tile) ** 2)) / n3d
    lm_loss = jnp.sqrt(jnp.sum(((preds["l_map"] - lm_gt) * tile) ** 2)) / n3d

    total = lambda_hm * hm_loss + lambda_dm * dm_loss + lambda_lm * lm_loss
    return total, {
        "det_hm": hm_loss,
        "det_dm": dm_loss,
        "det_lm": lm_loss,
        "det_total": total,
    }
