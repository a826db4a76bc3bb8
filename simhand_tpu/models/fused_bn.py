"""Custom-VJP BatchNorm: exact reference semantics, hand-derived backward.

Round-1 profiling showed ~50% of the rn50 train step in standalone
``convert_reduce_fusion`` kernels — the BN statistic and gradient
reductions autodiff emits, each re-reading activations from HBM. The
analytic BN backward needs exactly TWO reductions over the activation
(``sum(dy)`` and ``sum(dy * x_hat)``) which also ARE dbeta/dgamma, plus
one elementwise pass:

    dx = (gamma * inv) * (dy - sum_dy/M - x_hat * sum_dy_xhat / M)

Writing the VJP by hand hands XLA a minimal 2-reduce + elementwise
program instead of the autodiff graph. Forward statistics are one
two-output reduce (sum, sum-of-squares) over the bf16 activations with
f32 accumulation.

Semantics match ``flax.linen.BatchNorm`` (biased variance, f32 stats,
same running-average update); gradients match autodiff analytically.
Opt-in via ``ContrastiveModel(bn_fused=True)`` / ``BENCH_BN_FUSED=1``.
"""
from __future__ import annotations

from functools import partial
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp


@partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _bn_train(x, scale, bias, eps, stop_gradient_stats=False):
    y, _, _ = _bn_fwd_impl(x, scale, bias, eps)
    return y


def _bn_fwd_impl(x, scale, bias, eps):
    axes = tuple(range(x.ndim - 1))
    mu = jnp.mean(x, axis=axes, dtype=jnp.float32)
    m2 = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=axes)
    var = m2 - jnp.square(mu)
    inv = jax.lax.rsqrt(var + eps)
    a32 = inv * scale.astype(jnp.float32)
    b32 = bias.astype(jnp.float32) - mu * a32
    y = x * a32.astype(x.dtype) + b32.astype(x.dtype)
    return y, mu, var


def _bn_fwd(x, scale, bias, eps, stop_gradient_stats=False):
    y, mu, var = _bn_fwd_impl(x, scale, bias, eps)
    inv = jax.lax.rsqrt(var + eps)
    return y, (x, mu, inv, scale)


def _bn_bwd(eps, stop_gradient_stats, res, dy):
    x, mu, inv, scale = res
    axes = tuple(range(x.ndim - 1))
    m = x.size // x.shape[-1]
    dy32 = dy.astype(jnp.float32)
    xhat = (x.astype(jnp.float32) - mu) * inv
    # the ONLY two activation reductions of the backward — also the
    # parameter gradients
    sum_dy = jnp.sum(dy32, axis=axes)
    sum_dy_xhat = jnp.sum(dy32 * xhat, axis=axes)
    a = scale.astype(jnp.float32) * inv
    if stop_gradient_stats:
        # stats treated as constants: dx collapses to a scaled dy;
        # dgamma/dbeta keep the two reduces
        dx = a * dy32
    else:
        dx = a * (dy32 - sum_dy / m - xhat * (sum_dy_xhat / m))
    return (
        dx.astype(x.dtype),
        sum_dy_xhat.astype(scale.dtype),
        sum_dy.astype(scale.dtype),
    )


_bn_train.defvjp(_bn_fwd, _bn_bwd)


class FusedBatchNorm(nn.Module):
    """Drop-in BatchNorm with the hand-written training-mode VJP.

    Matches flax BatchNorm numerics: f32 statistics, biased variance,
    ``ra = momentum * ra + (1 - momentum) * stat`` running update.
    Cross-replica statistics (``axis_name``) are not supported here —
    use the default flax BN for that configuration.
    """

    use_running_average: bool = False
    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32
    axis_name: str | None = None
    # combine with the stop-gradient-through-stats variant (norm.py)
    stop_gradient_stats: bool = False

    @nn.compact
    def __call__(self, x, use_running_average: bool | None = None):
        assert self.axis_name is None, (
            "FusedBatchNorm is per-replica only; use flax BatchNorm for "
            "cross-replica statistics"
        )
        use_ra = (
            self.use_running_average
            if use_running_average is None
            else use_running_average
        )
        features = x.shape[-1]
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros(features, jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones(features, jnp.float32)
        )
        scale = self.param("scale", nn.initializers.ones, (features,),
                           self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros, (features,),
                          self.param_dtype)

        x = x.astype(self.dtype)
        if use_ra:
            inv = jax.lax.rsqrt(ra_var.value + self.epsilon)
            a32 = inv * scale.astype(jnp.float32)
            b32 = bias.astype(jnp.float32) - ra_mean.value * a32
            return x * a32.astype(self.dtype) + b32.astype(self.dtype)

        y = _bn_train(x, scale, bias, self.epsilon, self.stop_gradient_stats)
        if not self.is_initializing():
            # recompute stats outside the VJP for the running update —
            # XLA CSEs them with the forward's (identical expressions)
            _, mu, var = _bn_fwd_impl(
                jax.lax.stop_gradient(x), scale, bias, self.epsilon
            )
            ra_mean.value = (
                self.momentum * ra_mean.value + (1 - self.momentum) * mu
            )
            ra_var.value = (
                self.momentum * ra_var.value + (1 - self.momentum) * var
            )
        return y
