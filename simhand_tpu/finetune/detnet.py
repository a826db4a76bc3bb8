"""DetNet: heatmap + delta-map + location-map 3D hand-pose head, in flax.

Reference: minimal-hand/model/detnet/detnet.py (itself after Minimal-Hand
and I2L-MeshNet). Architecture, NHWC / TPU-first:

  ResNet-50/152 features (N, 4, 4, 2048)
  -> 3x deconv [256, 256, 256] (4x4 stride 2, BN, ReLU)   -> (N, 32, 32, 256)
  -> concat 2-ch coordinate tile (linspace -1..1 grids)    -> 258 ch
  -> hmap head: conv3x3+BN+ReLU -> 1x1 conv -> sigmoid     -> (N, 32, 32, 21)
  -> concat -> dmap head (279 in)                          -> (N, 32, 32, 21*3)
  -> concat -> lmap head (342 in)                          -> (N, 32, 32, 21*3)
  uv = argmax(hmap); xyz = lmap gathered at argmax; delta likewise.

The gather at the heatmap argmax is expressed as a one-hot matmul (MXU
friendly, no dynamic indexing under jit).
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from simhand_tpu.models.resnet import RESNETS

Array = jax.Array


def pose_tile(n: int, res: int = 32, dtype=jnp.float32) -> Array:
    """(N, res, res, 2) coordinate tile: ch0 = x (−1..1 across width),
    ch1 = y (−1..1 down height) — reference get_pose_tile_torch."""
    lin = jnp.linspace(-1.0, 1.0, res, dtype=dtype)
    gx = jnp.tile(lin[None, :], (res, 1))
    gy = jnp.tile(lin[:, None], (1, res))
    tile = jnp.stack([gx, gy], axis=-1)
    return jnp.broadcast_to(tile[None], (n, res, res, 2))


class _MapHead(nn.Module):
    """conv3x3 + BN + ReLU -> 1x1 conv prediction."""

    hidden: int
    out: int
    sigmoid: bool
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(
            self.hidden, (3, 3), use_bias=False,
            dtype=self.dtype, param_dtype=jnp.float32, name="project_conv",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, param_dtype=jnp.float32, name="project_bn",
        )(x)
        x = nn.relu(x)
        x = nn.Conv(
            self.out, (1, 1), dtype=self.dtype, param_dtype=jnp.float32,
            name="prediction",
        )(x)
        return nn.sigmoid(x) if self.sigmoid else x


class DetNet(nn.Module):
    """Full detnet. Input (N, 128, 128, 3), outputs dict of maps + joints."""

    resnet_size: str = "50"
    njoints: int = 21
    hm_res: int = 32
    dtype: Any = jnp.float32
    # backbone BN perf options (see simhand_tpu/models/{norm,fused_bn}.py)
    bn_stop_gradient_stats: bool = False
    bn_fused: bool = False
    # "xla" | "masked": stem max-pool backward impl (models/pool.py)
    maxpool: str = "xla"

    def setup(self):
        self.encoder = RESNETS[self.resnet_size](
            dtype=self.dtype, pool=False,
            bn_stop_gradient_stats=self.bn_stop_gradient_stats,
            bn_fused=self.bn_fused,
            maxpool=self.maxpool,
            name="encoder",
        )
        # I2L-MeshNet deconv stack: 2048 -> 256 -> 256 -> 256, each 2x up.
        self.deconvs = [
            nn.ConvTranspose(
                256, (4, 4), strides=(2, 2), padding="SAME",
                use_bias=False, dtype=self.dtype, param_dtype=jnp.float32,
                name=f"deconv{i}",
            )
            for i in range(3)
        ]
        self.deconv_bns = [
            nn.BatchNorm(
                momentum=0.9, epsilon=1e-5, dtype=self.dtype,
                param_dtype=jnp.float32, name=f"deconv_bn{i}",
            )
            for i in range(3)
        ]
        j = self.njoints
        self.hmap_head = _MapHead(256, j, sigmoid=True, dtype=self.dtype, name="hmap_0")
        self.dmap_head = _MapHead(256, j * 3, sigmoid=False, dtype=self.dtype, name="dmap_0")
        self.lmap_head = _MapHead(256, j * 3, sigmoid=False, dtype=self.dtype, name="lmap_0")

    def __call__(self, x: Array, train: bool = False) -> dict:
        n = x.shape[0]
        feats = self.encoder(x, train=train).astype(self.dtype)
        for deconv, bn in zip(self.deconvs, self.deconv_bns):
            feats = nn.relu(bn(deconv(feats), use_running_average=not train))

        x = jnp.concatenate([feats, pose_tile(n, self.hm_res, self.dtype)], axis=-1)

        hmap = self.hmap_head(x, train=train).astype(jnp.float32)
        x = jnp.concatenate([x, hmap.astype(self.dtype)], axis=-1)

        dmap = self.dmap_head(x, train=train).astype(jnp.float32)
        x = jnp.concatenate([x, dmap.astype(self.dtype)], axis=-1)

        lmap = self.lmap_head(x, train=train).astype(jnp.float32)

        j, r = self.njoints, self.hm_res
        dmap = dmap.reshape(n, r, r, j, 3)
        lmap = lmap.reshape(n, r, r, j, 3)

        uv, onehot = map_to_uv(hmap)
        xyz = gather_at_argmax(lmap, onehot)
        delta = gather_at_argmax(dmap, onehot)

        return {
            "h_map": hmap,      # (N, 32, 32, 21)
            "d_map": dmap,      # (N, 32, 32, 21, 3)
            "l_map": lmap,      # (N, 32, 32, 21, 3)
            "delta": delta,     # (N, 21, 3)
            "xyz": xyz,         # (N, 21, 3)
            "uv": uv,           # (N, 21, 2) — (row, col), reference order
        }


def map_to_uv(hmap: Array):
    """Argmax of each joint heatmap.

    Returns uv (N, J, 2) as (row, col) — matching the reference's
    (argmax // w, argmax % w) — and the flat one-hot (N, J, H*W) used for
    MXU-friendly gathers.
    """
    n, h, w, j = hmap.shape
    flat = hmap.transpose(0, 3, 1, 2).reshape(n, j, h * w)
    idx = jnp.argmax(flat, axis=-1)
    onehot = jax.nn.one_hot(idx, h * w, dtype=hmap.dtype)
    uv = jnp.stack([idx // w, idx % w], axis=-1)
    return uv, onehot


def gather_at_argmax(vmap: Array, onehot: Array) -> Array:
    """(N, H, W, J, 3) gathered at the per-joint argmax -> (N, J, 3)."""
    n, h, w, j, c = vmap.shape
    flat = vmap.transpose(0, 3, 1, 2, 4).reshape(n, j, h * w, c)
    return jnp.einsum("njp,njpc->njc", onehot, flat)
