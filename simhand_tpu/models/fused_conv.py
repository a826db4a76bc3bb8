"""Fused 1x1-conv + BatchNorm site: Mosaic forward, analytic backward.

The round-3 integration of the proven kernel-level win
(ops/conv1x1.py — the matmul-with-BN-stats-epilogue beats XLA's
dot + reduce pair by ~20% when cin >= 512, scripts/bench_conv1x1.py):
own the whole conv1x1+BN site with a custom VJP so the forward needs
one fewer traversal of the conv output.

Structure per site (rn50 bottleneck conv1/conv3, stride 1):

  XLA native fwd:  conv custom-call (write y) -> convert_reduce_fusion
                   (read y -> stats) -> apply fusion (read y, write o)
  here:            pallas matmul (write y + stats in the MXU epilogue)
                   -> apply fusion (read y, write o)

The backward reproduces XLA's autodiff structure exactly — this is the
round-2 lesson (CLAUDE.md): the BN gradient reduces must stay jnp so
they fuse with the kernel that PRODUCES the cotangent (the next conv's
backward), and dx/dw stay jnp matmuls (the same MXU library calls
autodiff emits). Only the forward changes.

Numerics: identical formulas to models/fused_bn.py (flax BatchNorm
semantics — f32 stats over the bf16 conv output, biased variance);
gradients analytically equal to autodiff through batch statistics.

Reference anchor: the conv+BN sites of torchvision bottlenecks the
reference wraps (src/models/resnet_model.py:6-58); perf anchor:
flax linear.py conv_general_dilated + the convert_reduce_fusions in
CLAUDE.md's round-2 HLO analysis.
"""
from __future__ import annotations

from functools import partial
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from simhand_tpu.ops.conv1x1 import conv1x1_stats


@partial(jax.custom_vjp, nondiff_argnums=(4,))
def conv1x1_bn_train(x2d, w, scale, bias, eps):
    """relu-less fused site: o = BN(x2d @ w) with batch statistics.

    Returns ``(o, mu, var)``; mu/var feed the running-stat update and are
    treated as non-differentiable outputs (their cotangents are ignored —
    they are zeros under the train step, where running stats are mutable
    state, not part of the loss).
    """
    o, mu, var, _ = _fused_fwd_impl(x2d, w, scale, bias, eps)
    return o, mu, var


def _fused_fwd_impl(x2d, w, scale, bias, eps):
    m = x2d.shape[0]
    y, s1, s2 = conv1x1_stats(x2d, w)
    mu = s1 / m
    var = s2 / m - jnp.square(mu)
    inv = jax.lax.rsqrt(var + eps)
    a32 = inv * scale.astype(jnp.float32)
    b32 = bias.astype(jnp.float32) - mu * a32
    # one fused elementwise pass over y; affine in f32 with a single
    # rounding, matching flax BatchNorm's promoted compute
    o = (y.astype(jnp.float32) * a32 + b32).astype(y.dtype)
    return o, mu, var, (y, inv)


def _fused_fwd(x2d, w, scale, bias, eps):
    o, mu, var, (y, inv) = _fused_fwd_impl(x2d, w, scale, bias, eps)
    return (o, mu, var), (x2d, w, y, mu, inv, scale)


def _fused_bwd(eps, res, cts):
    do, _dmu, _dvar = cts  # mu/var cotangents ignored (non-diff outputs)
    x2d, w, y, mu, inv, scale = res
    m = x2d.shape[0]
    do32 = do.astype(jnp.float32)
    # xhat recomputed elementwise from the saved bf16 conv output —
    # fuses into the reduce/dx passes like autodiff's residual
    xhat = (y.astype(jnp.float32) - mu) * inv
    # the only two activation reductions — also the parameter grads;
    # jnp so XLA rides them on the producer of `do`
    sum_do = jnp.sum(do32, axis=0)
    sum_do_xhat = jnp.sum(do32 * xhat, axis=0)
    a = scale.astype(jnp.float32) * inv
    dy = a * (do32 - sum_do / m - xhat * (sum_do_xhat / m))
    dy_bf = dy.astype(y.dtype)
    # conv backward = two matmuls (1x1 conv IS a matmul) — MXU library
    # calls, f32 accumulation, exactly what autodiff emits
    dx = jnp.dot(dy_bf, w.T, preferred_element_type=jnp.float32)
    dw = jnp.dot(x2d.T, dy_bf, preferred_element_type=jnp.float32)
    return (
        dx.astype(x2d.dtype),
        dw.astype(w.dtype),
        sum_do_xhat.astype(scale.dtype),
        sum_do.astype(scale.dtype),
    )


conv1x1_bn_train.defvjp(_fused_fwd, _fused_bwd)


class Conv1x1Kernel(nn.Module):
    """Parameter-only stand-in for ``nn.Conv(features, (1, 1))`` — declares
    the identical param tree (``{name: {kernel: (1, 1, cin, cout)}}``) so
    torch checkpoint interop is untouched; the compute happens in the
    caller's fused op."""

    features: int

    @nn.compact
    def __call__(self, cin: int):
        return self.param(
            "kernel",
            nn.linear.default_kernel_init,
            (1, 1, cin, self.features),
            jnp.float32,
        )


class BNParams(nn.Module):
    """Parameter/state-only stand-in for ``nn.BatchNorm`` (same tree:
    params ``scale``/``bias``, batch_stats ``mean``/``var``) with the
    flax running-average update applied from externally computed batch
    statistics."""

    momentum: float = 0.9

    @nn.compact
    def __call__(self, features: int):
        scale = self.param("scale", nn.initializers.ones, (features,),
                           jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (features,),
                          jnp.float32)
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros(features, jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones(features, jnp.float32)
        )
        return scale, bias, ra_mean, ra_var


def fused_conv_bn_site(
    parent: nn.Module,
    x,
    features: int,
    conv_name: str,
    bn_name: str,
    *,
    train: bool,
    momentum: float = 0.9,
    epsilon: float = 1e-5,
    dtype: Any = jnp.bfloat16,
    axis_name: str | None = None,
):
    """One bottleneck conv1x1+BN site through the fused path.

    Declares params under ``conv_name``/``bn_name`` with the exact trees
    ``nn.Conv``/``nn.BatchNorm`` would create (checkpoint-compatible),
    then computes train-mode via :func:`conv1x1_bn_train` and eval-mode
    via a plain matmul + running-stat affine.

    ``axis_name``: sync batch statistics (and, exactly like flax
    cross-replica BN under autodiff, the backward's stat reduces) over a
    mesh axis via psum — numerics match ``nn.BatchNorm(axis_name=...)``.
    """
    n, h, wd, cin = x.shape
    kernel = Conv1x1Kernel(features, name=conv_name)(cin)
    scale, bias, ra_mean, ra_var = BNParams(momentum, name=bn_name)(features)

    x2d = x.reshape(n * h * wd, cin).astype(dtype)
    w2d = kernel.reshape(cin, features).astype(dtype)

    if not train:
        y = jnp.dot(x2d, w2d, preferred_element_type=jnp.float32).astype(dtype)
        inv = jax.lax.rsqrt(ra_var.value + epsilon)
        a32 = inv * scale.astype(jnp.float32)
        b32 = bias.astype(jnp.float32) - ra_mean.value * a32
        o = (y.astype(jnp.float32) * a32 + b32).astype(dtype)
        return o.reshape(n, h, wd, features)

    if parent.is_initializing():
        # shape-only trace at init: plain jnp (no Mosaic compile)
        y = jnp.dot(x2d, w2d, preferred_element_type=jnp.float32).astype(dtype)
        mu = jnp.mean(y, axis=0, dtype=jnp.float32)
        var = jnp.mean(
            jnp.square(y.astype(jnp.float32)), axis=0
        ) - jnp.square(mu)
        inv = jax.lax.rsqrt(var + epsilon)
        a32 = inv * scale.astype(jnp.float32)
        b32 = bias.astype(jnp.float32) - mu * a32
        o = (y.astype(jnp.float32) * a32 + b32).astype(dtype)
        return o.reshape(n, h, wd, features)

    if axis_name is None:
        o, mu, var = conv1x1_bn_train(x2d, w2d, scale, bias, epsilon)
    else:
        o, mu, var = _conv1x1_bn_train_synced(
            x2d, w2d, scale, bias, epsilon, axis_name
        )
    if not parent.is_initializing():
        ra_mean.value = momentum * ra_mean.value + (1 - momentum) * mu
        ra_var.value = momentum * ra_var.value + (1 - momentum) * var
    return o.reshape(n, h, wd, features)


@partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _conv1x1_bn_train_synced(x2d, w, scale, bias, eps, axis_name):
    o, mu, var, _ = _fused_fwd_impl_synced(x2d, w, scale, bias, eps,
                                           axis_name)
    return o, mu, var


def _fused_fwd_impl_synced(x2d, w, scale, bias, eps, axis_name):
    m_local = x2d.shape[0]
    y, s1, s2 = conv1x1_stats(x2d, w)
    n_dev = jax.lax.psum(1, axis_name)
    m = m_local * n_dev
    mu = jax.lax.psum(s1, axis_name) / m
    var = jax.lax.psum(s2, axis_name) / m - jnp.square(mu)
    inv = jax.lax.rsqrt(var + eps)
    a32 = inv * scale.astype(jnp.float32)
    b32 = bias.astype(jnp.float32) - mu * a32
    o = (y.astype(jnp.float32) * a32 + b32).astype(y.dtype)
    return o, mu, var, (y, inv)


def _fused_fwd_synced(x2d, w, scale, bias, eps, axis_name):
    o, mu, var, (y, inv) = _fused_fwd_impl_synced(
        x2d, w, scale, bias, eps, axis_name
    )
    return (o, mu, var), (x2d, w, y, mu, inv, scale)


def _fused_bwd_synced(eps, axis_name, res, cts):
    do, _dmu, _dvar = cts
    x2d, w, y, mu, inv, scale = res
    n_dev = jax.lax.psum(1, axis_name)
    m = x2d.shape[0] * n_dev
    do32 = do.astype(jnp.float32)
    xhat = (y.astype(jnp.float32) - mu) * inv
    local_sum_do = jnp.sum(do32, axis=0)
    local_sum_do_xhat = jnp.sum(do32 * xhat, axis=0)
    # dy needs the GLOBAL sums (the batch statistics are global), but the
    # RETURNED parameter grads stay local partial sums — identical to
    # autodiff of flax synced-BN per device; the data-parallel train loop
    # reduces parameter gradients across devices afterwards, exactly as
    # for every other parameter.
    sum_do = jax.lax.psum(local_sum_do, axis_name)
    sum_do_xhat = jax.lax.psum(local_sum_do_xhat, axis_name)
    a = scale.astype(jnp.float32) * inv
    dy = a * (do32 - sum_do / m - xhat * (sum_do_xhat / m))
    dy_bf = dy.astype(y.dtype)
    dx = jnp.dot(dy_bf, w.T, preferred_element_type=jnp.float32)
    dw = jnp.dot(x2d.T, dy_bf, preferred_element_type=jnp.float32)
    return (
        dx.astype(x2d.dtype),
        dw.astype(w.dtype),
        local_sum_do_xhat.astype(scale.dtype),
        local_sum_do.astype(scale.dtype),
    )


_conv1x1_bn_train_synced.defvjp(_fused_fwd_synced, _fused_bwd_synced)
