"""Downstream 2.5D regression head with MLP root-depth refinement.

Reference: src/models/rn_25D_wMLPref.py (the PeCLR-paper downstream
model, kept for checkpoint/eval compatibility): ResNet -> 21*3+1 linear
head; the scale-normalized root depth is recovered analytically from the
unit-bone constraint (arXiv:1804.09534 eq. 6/7, bone indices 3->8) and
refined by an MLP (arXiv:2003.09282).
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from simhand_tpu.models.resnet import RESNETS

Array = jax.Array

DEFAULT_K = jnp.array(
    [
        [388.9018310596544, 0.0, 112.0],
        [0.0, 388.71231836584275, 112.0],
        [0.0, 0.0, 1.0],
    ],
    jnp.float32,
)


class ZrootMLPRef(nn.Module):
    """zroot_refined = zroot_analytic + MLP(2D, zrel, zroot)."""

    dtype: Any = jnp.float32
    norm_bone_idx: tuple[int, int] = (3, 8)

    @nn.compact
    def __call__(self, kp3d_unnorm: Array, zrel: Array, train: bool = False) -> Array:
        eps = 1e-8
        m, n = self.norm_bone_idx
        X_m, Y_m = kp3d_unnorm[:, m, 0], kp3d_unnorm[:, m, 1]
        X_n, Y_n = kp3d_unnorm[:, n, 0], kp3d_unnorm[:, n, 1]
        z_m, z_n = zrel[:, m, 0], zrel[:, n, 0]

        a = (X_n - X_m) ** 2 + (Y_n - Y_m) ** 2
        b = 2.0 * (
            z_n * (X_n**2 + Y_n**2 - X_n * X_m - Y_n * Y_m)
            + z_m * (X_m**2 + Y_m**2 - X_n * X_m - Y_n * Y_m)
        )
        c = (
            (X_n * z_n - X_m * z_m) ** 2
            + (Y_n * z_n - Y_m * z_m) ** 2
            + (z_n - z_m) ** 2
            - 1.0
        )
        d = jnp.maximum(b * b - 4.0 * a * c, eps)
        a = jnp.maximum(a, eps)
        zroot = jax.lax.stop_gradient((-b + jnp.sqrt(d)) / (2.0 * a))
        zroot = jnp.clip(zroot, 4.0, 50.0)

        mlp_in = jnp.concatenate(
            [
                zrel.reshape(-1, 21),
                kp3d_unnorm[..., :2].reshape(-1, 42),
                zroot.reshape(-1, 1),
            ],
            axis=1,
        )
        x = mlp_in.astype(self.dtype)
        for i, h in enumerate((128, 128)):
            x = nn.Dense(h, dtype=self.dtype, param_dtype=jnp.float32, name=f"fc{i}")(x)
            x = nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                dtype=self.dtype, param_dtype=jnp.float32, name=f"bn{i}",
            )(x)
            x = nn.leaky_relu(x)
        x = nn.Dense(1, dtype=self.dtype, param_dtype=jnp.float32, name="fc_out")(x)
        return zroot + x.reshape(zroot.shape).astype(jnp.float32)


class RN25DWithMLPRef(nn.Module):
    """ResNet -> (21, 3)+1 regression -> analytic+MLP zroot -> 3D joints."""

    resnet_size: str = "50"
    dtype: Any = jnp.float32

    def setup(self):
        self.encoder = RESNETS[self.resnet_size](dtype=self.dtype, name="encoder")
        self.fc = nn.Dense(3 * 21 + 1, param_dtype=jnp.float32, name="fc")
        self.zroot_ref = ZrootMLPRef(dtype=self.dtype, name="zroot_ref")

    def __call__(self, img: Array, K: Array | None = None, train: bool = False):
        B = img.shape[0]
        if K is None:
            K = jnp.broadcast_to(DEFAULT_K, (B, 3, 3))
        out = self.fc(self.encoder(img, train=train))
        kp25d = out[:, :-1].reshape(-1, 21, 3)
        kp2d = kp25d[..., :2]
        zrel = kp25d[..., 2:3]
        zrel = zrel.at[:, 0].set(0.0)  # root's relative depth is zero
        # the reference's in-place `zrel[:, 0] = 0` mutates the aliased
        # kp25d view too (rn_25D_wMLPref.py) — mirror that in the output
        kp25d = jnp.concatenate([kp2d, zrel], axis=-1)

        kp2d_h = jnp.concatenate([kp2d, jnp.ones((B, 21, 1), kp2d.dtype)], axis=2)
        K_inv = jnp.linalg.inv(K)
        kp3d_unnorm = jnp.einsum("bnk,bjk->bnj", kp2d_h, K_inv)
        zroot = self.zroot_ref(kp3d_unnorm, zrel, train=train)
        kp3d = kp3d_unnorm * (zrel + zroot[:, None, None])
        return {"kp3d": kp3d, "zrel": zrel, "kp2d": kp2d, "kp25d": kp25d}


def normalize_heatmap(heatmap: Array, beta: Array | None = None) -> Array:
    """Softmax-style per-channel heatmap normalization
    (reference: src/models/utils.py:704-713)."""
    if beta is None:
        beta = jnp.ones((1, heatmap.shape[1], 1, 1), heatmap.dtype)
    h = jnp.exp(heatmap) * beta
    s = jnp.sum(h, axis=(2, 3), keepdims=True)
    return h / s


def heatmap_transformation_matrix(
    jitter_x: Array,
    jitter_y: Array,
    scale: Array,
    angle: Array,
    heatmap_dim: tuple[float, float],
) -> Array:
    """Batched (B, 2, 3) affine that reverts heatmap augmentation: a pixel
    translation composed with a scaled rotation about the heatmap centre
    (legacy heatmap path; reference: src/models/utils.py:766-806 via kornia —
    here built from the cv2-convention rotation matrix directly).
    """
    from simhand_tpu.core.geometry import opencv_rotation_matrix

    jx = jnp.asarray(jitter_x, jnp.float32).reshape(-1)
    jy = jnp.asarray(jitter_y, jnp.float32).reshape(-1)
    cx = jnp.full_like(jx, heatmap_dim[1] / 2.0)
    cy = jnp.full_like(jy, heatmap_dim[0] / 2.0)
    rot = opencv_rotation_matrix(
        cx, cy, jnp.asarray(angle, jnp.float32).reshape(-1),
        jnp.asarray(scale, jnp.float32).reshape(-1),
    )  # (B, 2, 3)
    # rot @ [[1,0,jx],[0,1,jy],[0,0,1]]: the translation folds into col 2
    t = rot[..., 0] * jx[:, None] + rot[..., 1] * jy[:, None] + rot[..., 2]
    return jnp.concatenate([rot[..., :2], t[..., None]], axis=-1)


def affine_mat_to_theta(affine_mat: Array, w: float, h: float) -> Array:
    """Converts a pixel-space (B, 2, 3) affine into the normalized
    [-1, 1]-grid theta used by grid-sample-style warps
    (reference: src/models/utils.py:808-835).
    """
    m = jnp.asarray(affine_mat, jnp.float32)
    theta = jnp.stack(
        [
            jnp.stack(
                [
                    m[:, 0, 0],
                    m[:, 0, 1] * h / w,
                    m[:, 0, 2] * 2.0 / w + m[:, 0, 0] + m[:, 0, 1] - 1.0,
                ],
                axis=-1,
            ),
            jnp.stack(
                [
                    m[:, 1, 0] * w / h,
                    m[:, 1, 1],
                    m[:, 1, 2] * 2.0 / h + m[:, 1, 0] + m[:, 1, 1] - 1.0,
                ],
                axis=-1,
            ),
        ],
        axis=-2,
    )
    return theta


class Denoiser(nn.Module):
    """zroot denoiser MLP (reference: src/models/utils.py:716-725)."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        x = x.astype(self.dtype)
        for i in range(2):
            x = nn.Dense(128, dtype=self.dtype, param_dtype=jnp.float32,
                         name=f"fc{i}")(x)
            x = nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                dtype=self.dtype, param_dtype=jnp.float32, name=f"bn{i}",
            )(x)
            x = nn.relu(x)
        return nn.Dense(1, dtype=self.dtype, param_dtype=jnp.float32,
                        name="fc_out")(x).astype(jnp.float32)
