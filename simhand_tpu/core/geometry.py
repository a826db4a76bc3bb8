"""Pure-JAX hand-geometry primitives.

All functions are batched-first (leading batch axis), side-effect free and
jit/vmap/pjit friendly. They replicate the reference numerics:

* 2.5D <-> 3D conversion & scale-normalized root depth
  (reference: src/data_loader/utils.py:19-108, arXiv:1804.09534 eq. 6/7)
* OpenCV-convention 2D rotation matrices
  (reference: src/models/utils.py:606-633, cv2.getRotationMatrix2D)
* crop-box geometry used by the augmentation pipeline
  (reference: src/data_loader/sample_augmenter.py:425-476)
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from simhand_tpu.core.joints import CHILD_JOINT, PARENT_JOINT


# --------------------------------------------------------------------------
# 2.5D representation (arXiv:1804.09534)
# --------------------------------------------------------------------------

def convert_to_2_5d(K: jnp.ndarray, joints_3d: jnp.ndarray):
    """3D camera-space joints -> 2.5D (pixel u, v, scale-normalized rel. depth).

    Args:
      K: (..., 3, 3) camera intrinsics.
      joints_3d: (..., 21, 3) joints in camera space.

    Returns:
      joints_25d: (..., 21, 3) — u, v in pixels; z relative to the wrist,
        normalized by the wrist->index_mcp bone length.
      scale: (...,) the bone length used for normalization.
    """
    bone = joints_3d[..., CHILD_JOINT, :] - joints_3d[..., PARENT_JOINT, :]
    scale = jnp.sqrt(jnp.sum(bone * bone, axis=-1))
    # Project: (K @ X^T)^T / z  — x,y become pixels, z becomes 1.
    proj = jnp.einsum(
        "...ij,...kj->...ki", K, joints_3d, precision=jax.lax.Precision.HIGHEST
    ) / joints_3d[..., -1:]
    z_rel = (joints_3d[..., -1] - joints_3d[..., PARENT_JOINT, -1][..., None]) / scale[..., None]
    return jnp.concatenate([proj[..., :2], z_rel[..., None]], axis=-1), scale


def root_depth(joints_25d: jnp.ndarray, K: jnp.ndarray):
    """Scale-normalized absolute root (wrist) depth from 2.5D joints.

    Solves the quadratic of arXiv:1804.09534 eq. 6/7 using the unit
    bone-length constraint between wrist and index_mcp
    (reference: src/data_loader/utils.py:69-108).

    Args:
      joints_25d: (..., 21, 3).
      K: (..., 3, 3).

    Returns:
      z_root: (...,) scale-normalized root depth; K_inv: (..., 3, 3).
    """
    K_inv = jnp.linalg.inv(K)
    ones = jnp.ones_like(joints_25d[..., :1, -1])

    def back_project(j):
        uv1 = jnp.concatenate([joints_25d[..., j, :2], ones[..., 0][..., None]], axis=-1)
        return jnp.einsum(
            "...ij,...j->...i", K_inv, uv1, precision=jax.lax.Precision.HIGHEST
        )

    xyz_n = back_project(PARENT_JOINT)
    xyz_m = back_project(CHILD_JOINT)
    x_n, y_n = xyz_n[..., 0], xyz_n[..., 1]
    x_m, y_m = xyz_m[..., 0], xyz_m[..., 1]
    Z_n = joints_25d[..., PARENT_JOINT, -1]
    Z_m = joints_25d[..., CHILD_JOINT, -1]
    C = 1.0

    a = (x_n - x_m) ** 2 + (y_n - y_m) ** 2
    b = 2.0 * (
        Z_n * (x_n**2 + y_n**2 - x_n * x_m - y_n * y_m)
        + Z_m * (x_m**2 + y_m**2 - x_n * x_m - y_n * y_m)
    )
    c = (
        (x_n * Z_n - x_m * Z_m) ** 2
        + (y_n * Z_n - y_m * Z_m) ** 2
        + (Z_n - Z_m) ** 2
        - C
    )
    z_root = 0.5 * (-b + jnp.sqrt(jnp.clip(b * b - 4.0 * a * c, min=1e-6))) / jnp.clip(a, min=1e-6)
    return z_root, K_inv


def convert_2_5d_to_3d(
    joints_25d: jnp.ndarray,
    scale: jnp.ndarray,
    K: jnp.ndarray,
    z_root: jnp.ndarray | None = None,
):
    """2.5D joints -> metric 3D camera-space joints.

    Args:
      joints_25d: (..., 21, 3); scale: (...,); K: (..., 3, 3).
      z_root: optional externally-refined scale-normalized root depth.

    Returns:
      (..., 21, 3) 3D joints.
    """
    z_root_calc, K_inv = root_depth(joints_25d, K)
    if z_root is None:
        z_root = z_root_calc
    z = (joints_25d[..., -1] + z_root[..., None]) * scale[..., None]
    uv1 = jnp.concatenate(
        [joints_25d[..., :2], jnp.ones_like(joints_25d[..., -1:])], axis=-1
    )
    rays = jnp.einsum(
        "...kj,...ij->...ki", uv1, K_inv, precision=jax.lax.Precision.HIGHEST
    )
    return rays * z[..., None]


# --------------------------------------------------------------------------
# 2D rotation (OpenCV convention)
# --------------------------------------------------------------------------

def rotation_matrix_2d(angle_deg: jnp.ndarray) -> jnp.ndarray:
    """Counter-clockwise 2x2 rotation matrix (batched over leading dims)."""
    rad = angle_deg * (jnp.pi / 180.0)
    c, s = jnp.cos(rad), jnp.sin(rad)
    return jnp.stack(
        [jnp.stack([c, -s], axis=-1), jnp.stack([s, c], axis=-1)], axis=-2
    )


def opencv_rotation_matrix(
    center_x: jnp.ndarray,
    center_y: jnp.ndarray,
    angle_deg: jnp.ndarray,
    scale: jnp.ndarray | float = 1.0,
) -> jnp.ndarray:
    """cv2.getRotationMatrix2D semantics, batched: (..., 2, 3).

    Positive angle rotates *counter-clockwise* in image coordinates (y down),
    matching OpenCV. Used for both image warps and the PeCLR feature-space
    inverse rotation (reference: src/models/utils.py:606-633).
    """
    rad = angle_deg * (jnp.pi / 180.0)
    alpha = scale * jnp.cos(rad)
    beta = scale * jnp.sin(rad)
    row0 = jnp.stack(
        [alpha, beta, (1.0 - alpha) * center_x - beta * center_y], axis=-1
    )
    row1 = jnp.stack(
        [-beta, alpha, beta * center_x + (1.0 - alpha) * center_y], axis=-1
    )
    return jnp.stack([row0, row1], axis=-2)


def apply_affine_2d(points: jnp.ndarray, mat: jnp.ndarray) -> jnp.ndarray:
    """Applies a (..., 2, 3) affine matrix to (..., N, 2) points."""
    return (
        jnp.einsum("...ij,...nj->...ni", mat[..., :2], points)
        + mat[..., None, :, 2]
    )


# --------------------------------------------------------------------------
# Crop-box geometry (augmentation pipeline)
# --------------------------------------------------------------------------

def crop_box_from_joints(
    joints_xy: jnp.ndarray,
    crop_margin: jnp.ndarray | float,
    jitter_xy: jnp.ndarray,
):
    """Square crop box around the joint centroid.

    Replicates the reference geometry (sample_augmenter.py:425-476):
    center = int(mean), side = int(max radius * margin), origin clamped at 0,
    and the recorded jitter is ``center - side - origin`` (<= 0).

    Args:
      joints_xy: (..., 21, 2) pixel coordinates.
      crop_margin: scalar or (...,) margin multiplier.
      jitter_xy: (..., 2) integer-valued crop jitter (>= 0).

    Returns:
      origin_xy: (..., 2) crop origin (float, integer-valued),
      side: (...,) crop side length (2 * radius, integer-valued),
      recorded_jitter_xy: (..., 2) the jitter actually applied
        (negative of the translation the crop induced beyond centering).
    """
    center = jnp.trunc(jnp.mean(joints_xy, axis=-2))  # int() truncates
    r2 = jnp.sum((joints_xy - center[..., None, :]) ** 2, axis=-1)
    side_half = jnp.trunc(jnp.sqrt(jnp.max(r2, axis=-1)) * crop_margin)
    origin = jnp.maximum(center - side_half[..., None] + jitter_xy, 0.0)
    recorded_jitter = center - side_half[..., None] - origin
    return origin, 2.0 * side_half, recorded_jitter
