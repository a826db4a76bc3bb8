"""Supervised 2.5D losses and EPE metrics.

Reference: src/models/utils.py:23-107 (cal_l1_loss, cal_3d_loss,
calculate_metrics). Used by the downstream 2.5D regression head.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from simhand_tpu.core.geometry import convert_2_5d_to_3d

Array = jax.Array


def l1_loss_25d(
    pred_joints: Array,
    true_joints: Array,
    scale: Array,
    joints_valid: Array | None = None,
):
    """Validity-weighted L1 on 2.5D joints; z penalized separately.

    Args:
      pred_joints, true_joints: (B, 21, 3).
      scale: (B,) bone scale to unscale the relative depth.
      joints_valid: (B, 21, 1) or None (all valid).

    Returns:
      (loss_2d, loss_z, loss_z_unscaled) scalars.
    """
    if joints_valid is None:
        joints_valid = jnp.ones_like(true_joints[..., -1:])
    w = joints_valid / jnp.sum(joints_valid)
    err = jnp.abs(pred_joints - true_joints)
    loss_2d = jnp.sum(err[..., :-1] * w) / 2.0
    loss_z = err[..., -1:] * w
    loss_z_unscaled = jnp.sum(loss_z * scale.reshape(-1, 1, 1))
    return loss_2d, jnp.sum(loss_z), loss_z_unscaled


def loss_3d(
    pred_25d: Array,
    joints3d_gt: Array,
    scale: Array,
    K: Array,
    joints_valid: Array,
    z_root: Array | None = None,
) -> Array:
    """3D MAE after lifting predicted 2.5D joints back to camera space."""
    pred_3d = convert_2_5d_to_3d(pred_25d, scale, K, z_root=z_root)
    w = joints_valid / jnp.sum(joints_valid)
    return jnp.sum(jnp.abs(pred_3d - joints3d_gt) * w) / 3.0


def torch_median(x: Array, axis: int | None = None) -> Array:
    """``torch.median`` semantics: the LOWER of the two middle order
    statistics for even counts (sorted index ``(n-1)//2``), where
    ``jnp.median`` would interpolate. The reference logs medians through
    torch, so metric parity needs this variant."""
    if axis is None:
        x = x.ravel()
        axis = 0
    n = x.shape[axis]
    return jnp.take(jnp.sort(x, axis=axis), (n - 1) // 2, axis=axis)


def epe_metrics(y_pred: Array, y_true: Array, prefix: str = "train"):
    """Mean / median end-point error over (B, 21, D) joints
    (reference: src/models/utils.py:56-76 — median via torch.median)."""
    d = jnp.sqrt(jnp.sum((y_pred - y_true) ** 2, axis=-1))
    return {
        f"EPE_mean_{prefix}": jnp.mean(d),
        f"EPE_median_{prefix}": torch_median(d),
    }
