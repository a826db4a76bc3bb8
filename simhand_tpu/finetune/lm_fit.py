"""Levenberg–Marquardt MANO shape fitting.

Alternative to the PSO fitter (reference: minimal-hand/utils/LM.py,
LM_new.py, optimize_shape.py): minimizes the relative-bone-length residual
r(beta) = bone_len(beta) - target with Tikhonov-damped Gauss-Newton steps.
The Jacobian comes from jax.jacfwd — exact, no finite differences.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from simhand_tpu.finetune.mano import ManoModel, relative_bone_lengths


def align_bone_len(pred: np.ndarray, gt: np.ndarray) -> float:
    """Mean absolute relative-bone-length error
    (reference: optimize_shape.py:10-21)."""
    return float(np.mean(np.abs(np.asarray(pred) - np.asarray(gt))))


def lm_fit_shape(
    mano: ManoModel,
    rel_bone_len: np.ndarray,
    n_iters: int = 20,
    damping: float = 1e-2,
    reg: float = 1e-3,
    beta0: np.ndarray | None = None,
):
    """Fits beta (10,) to 15 target relative bone lengths.

    Returns (beta, final_residual_norm).
    """
    target = jnp.asarray(rel_bone_len, jnp.float32)

    def residual(beta):
        return relative_bone_lengths(mano, beta[None])[0] - target

    jac_fn = jax.jit(jax.jacfwd(residual))
    res_fn = jax.jit(residual)

    beta = jnp.zeros(10) if beta0 is None else jnp.asarray(beta0, jnp.float32)
    lam = damping
    prev_cost = float(jnp.sum(res_fn(beta) ** 2) + reg * jnp.sum(beta**2))
    for _ in range(n_iters):
        r = res_fn(beta)
        J = jac_fn(beta)                                   # (15, 10)
        A = J.T @ J + (lam + reg) * jnp.eye(10)
        g = J.T @ r + reg * beta
        step = jnp.linalg.solve(A, g)
        new_beta = jnp.clip(beta - step, -3.0, 3.0)
        cost = float(jnp.sum(res_fn(new_beta) ** 2) + reg * jnp.sum(new_beta**2))
        if cost < prev_cost:
            beta, prev_cost = new_beta, cost
            lam = max(lam * 0.5, 1e-6)
        else:
            lam = min(lam * 4.0, 1e3)
    return np.asarray(beta), prev_cost
