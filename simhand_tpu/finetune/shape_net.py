"""ShapeNet: MLP regressing MANO shape (beta) from relative bone lengths,
plus its SIK loss and the PSO baseline fitter.

Reference: minimal-hand/model/shape_net.py (MLP 15->[128,256,512,256,128]
->10, tanh-bounded), losses/shape_loss.py (bone-length L2 + 1e-3 beta
reg), op_pso.py (particle swarm over beta in [-3,3]^10).
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from simhand_tpu.finetune.mano import ManoModel, relative_bone_lengths

Array = jax.Array


class ShapeNet(nn.Module):
    hidden: tuple = (128, 256, 512, 256, 128)
    out_dim: int = 10
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, bone_len: Array) -> Array:
        x = bone_len.astype(self.dtype)
        for i, h in enumerate(self.hidden):
            x = nn.Dense(h, dtype=self.dtype, param_dtype=jnp.float32,
                         name=f"fc{i}")(x)
            x = nn.relu(x)
        x = nn.Dense(self.out_dim, dtype=self.dtype, param_dtype=jnp.float32,
                     name="fc_out")(x)
        return jnp.tanh(x).astype(jnp.float32)


def sik_loss(mano: ManoModel, beta: Array, rel_bone_len: Array,
             reg: float = 1e-3):
    """||bone_len(beta) - target||^2 + reg * ||beta||^2
    (reference: losses/shape_loss.py:32-53)."""
    bone_hat = relative_bone_lengths(mano, beta)
    fit = jnp.sum((bone_hat - rel_bone_len) ** 2, axis=-1)
    return jnp.mean(fit + reg * jnp.sum(beta**2, axis=-1)), bone_hat


def sample_shape_dataset(mano: ManoModel, n: int, seed: int = 0):
    """(bone_len, beta) pairs for ShapeNet training — beta ~ 3*N(0,1)
    (reference: minimal-hand/create_data.py:55-60)."""
    rng = np.random.default_rng(seed)
    beta = (3.0 * rng.standard_normal((n, 10))).astype(np.float32)
    bones = np.asarray(relative_bone_lengths(mano, jnp.asarray(beta)))
    return bones, beta


def pso_fit_shape(
    mano: ManoModel,
    rel_bone_len: np.ndarray,
    n_particles: int = 100,
    n_iters: int = 30,
    reg: float = 1e-3,
    seed: int = 0,
    w: float = 0.7298,
    c1: float = 1.49618,
    c2: float = 1.49618,
):
    """Particle-swarm beta fit (reference: op_pso.py:15-170), vectorized
    over particles on-device.

    Args:
      rel_bone_len: (15,) target relative bone lengths.

    Returns:
      (10,) best beta.
    """
    rng = np.random.default_rng(seed)
    target = jnp.asarray(rel_bone_len, jnp.float32)[None]

    @jax.jit
    def cost(betas):
        bones = relative_bone_lengths(mano, betas)
        return jnp.sum((bones - target) ** 2, axis=-1) + reg * jnp.sum(
            betas**2, axis=-1
        )

    x = rng.uniform(-3, 3, (n_particles, 10)).astype(np.float32)
    v = np.zeros_like(x)
    pbest = x.copy()
    pbest_cost = np.array(cost(jnp.asarray(x)))
    g = pbest[pbest_cost.argmin()].copy()
    g_cost = pbest_cost.min()

    for _ in range(n_iters):
        r1 = rng.random((n_particles, 10)).astype(np.float32)
        r2 = rng.random((n_particles, 10)).astype(np.float32)
        v = w * v + c1 * r1 * (pbest - x) + c2 * r2 * (g[None] - x)
        x = np.clip(x + v, -3.0, 3.0)
        c = np.array(cost(jnp.asarray(x)))
        better = c < pbest_cost
        pbest[better] = x[better]
        pbest_cost[better] = c[better]
        if pbest_cost.min() < g_cost:
            g = pbest[pbest_cost.argmin()].copy()
            g_cost = pbest_cost.min()
    return g
