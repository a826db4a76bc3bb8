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
from jax.experimental import pallas as pl


@partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _bn_train(x, scale, bias, eps, stop_gradient_stats=False, impl="xla"):
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


def _bn_fwd(x, scale, bias, eps, stop_gradient_stats=False, impl="xla"):
    y, mu, var = _bn_fwd_impl(x, scale, bias, eps)
    inv = jax.lax.rsqrt(var + eps)
    return y, (x, mu, inv, scale)


def _bn_bwd(eps, stop_gradient_stats, impl, res, dy):
    x, mu, inv, scale = res
    axes = tuple(range(x.ndim - 1))
    c = x.shape[-1]
    m = x.size // c
    dy32 = dy.astype(jnp.float32)
    # the ONLY two activation reductions of the backward — also the
    # parameter gradients
    if impl == "pallas":
        sum_dy, sum_dy_xhat = bn_backward_reduces(
            x.reshape(m, c), dy.reshape(m, c), mu, inv
        )
    else:
        xhat32 = (x.astype(jnp.float32) - mu) * inv
        sum_dy = jnp.sum(dy32, axis=axes)
        sum_dy_xhat = jnp.sum(dy32 * xhat32, axis=axes)
    a = scale.astype(jnp.float32) * inv
    if stop_gradient_stats:
        # stats treated as constants: dx collapses to a scaled dy;
        # dgamma/dbeta keep the two reduces
        dx = a * dy32
    else:
        # xhat recomputed elementwise — fuses into the dx pass
        xhat = (x.astype(jnp.float32) - mu) * inv
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
    # "xla" (default) or "pallas": one-pass dual-reduce kernel for the
    # backward's sum(dy)/sum(dy*xhat)
    reduce_impl: str = "xla"

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

        y = _bn_train(x, scale, bias, self.epsilon, self.stop_gradient_stats,
                      self.reduce_impl)
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


# --------------------------------------------------------------------------
# pallas dual-reduce: sum(dy) and sum(dy * x_hat) in one pass
# --------------------------------------------------------------------------

def _dual_reduce_kernel(x_ref, dy_ref, mu_ref, inv_ref, sdy_ref, sdyx_ref):
    i = pl.program_id(0)
    x = x_ref[...].astype(jnp.float32)
    dy = dy_ref[...].astype(jnp.float32)
    xhat = (x - mu_ref[...]) * inv_ref[...]
    psd = jnp.sum(dy, axis=0, keepdims=True)
    psx = jnp.sum(dy * xhat, axis=0, keepdims=True)

    @pl.when(i == 0)
    def _init():
        sdy_ref[...] = psd
        sdyx_ref[...] = psx

    @pl.when(i != 0)
    def _acc():
        sdy_ref[...] += psd
        sdyx_ref[...] += psx


def bn_backward_reduces(
    x2d, dy2d, mu, inv, interpret: bool | None = None
):
    """One-pass (sum_dy, sum_dy_xhat) over (M, C) activations — the two
    reductions of the analytic BN backward, tiled so each (TM, C) block
    is read once from HBM and accumulated in VMEM.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    m, c = x2d.shape
    # (TM * C) elements per input block; keep both inputs + f32 temps
    # within a few MB of VMEM
    tm = max(8, min(m, (1 << 18) // max(c, 128) * 8 // 8))
    # largest power-of-2 tile that divides m
    while m % tm:
        tm //= 2
    grid = (m // tm,)
    out_shape = (
        jax.ShapeDtypeStruct((1, c), jnp.float32),
        jax.ShapeDtypeStruct((1, c), jnp.float32),
    )
    sdy, sdyx = pl.pallas_call(
        _dual_reduce_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tm, c), lambda i: (i, 0)),
            pl.BlockSpec((tm, c), lambda i: (i, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, c), lambda i: (0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
        ],
        out_shape=out_shape,
        interpret=interpret,
    )(x2d, dy2d, mu.reshape(1, c), inv.reshape(1, c))
    return sdy.reshape(c), sdyx.reshape(c)
