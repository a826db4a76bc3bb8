"""Fused BN+ReLU epilogue with a Pallas (Mosaic) backward.

Round-1 profiling (CLAUDE.md): ~50% of the rn50 train step sits in XLA's
``convert_reduce_fusion`` kernels — the conv-backward output fusions that
apply the ReLU mask and ride the BN backward's two activation reductions —
and they run at 30-40% of HBM bandwidth (cross-sublane reduction under
T(8, 128) tiling). The structure is already minimal; the gap is codegen.

This module owns the whole BN-apply + ReLU epilogue under one
``jax.custom_vjp`` and implements its backward as two Mosaic kernels with
the same minimal traffic structure XLA uses, but explicit tiling:

  kernel A (masked dual-reduce): reads g, x  ->  sum(dy), sum(dy*xhat)
      where dy = g * relu_mask; the mask is recomputed from x and the
      per-channel affine (y = A*x + B > 0), so dy is NEVER materialized.
  kernel B (dx elementwise):     reads g, x  ->  dx (bf16)

Total: 4 plane reads + 1 plane write per BN backward — identical to
XLA's fusion structure (reference point: flax BN + relu autodiff), so any
speedup is pure DMA-pipelining/codegen win, measured by
``scripts/bench_epilogue.py`` on-chip.

Semantics: flax BatchNorm training mode (biased variance, f32 stats) +
ReLU, gradients analytically identical to autodiff. The ``+ residual``
bottleneck tail (relu(bn(x) + res)) is covered by ``bn_add_relu_train``
whose backward additionally emits dres = masked g.

Reference encoder hot loop: /root/reference/src/models/*resnet* via
torchvision; BN semantics parity is tested in tests/test_bn_epilogue.py.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _affine_consts(mu, inv, scale, bias):
    """Per-channel constants: y = A*x + B, xhat = C*x + D (all f32)."""
    A = scale.astype(jnp.float32) * inv
    B = bias.astype(jnp.float32) - mu * A
    C = inv
    D = -mu * inv
    return A, B, C, D


# --------------------------------------------------------------------------
# kernel A: masked dual reduce   (g, x) -> sum(dy), sum(dy * xhat)
# --------------------------------------------------------------------------

def _masked_reduce_kernel(g_ref, x_ref, a_ref, b_ref, c_ref, d_ref,
                          sdy_ref, sdyx_ref, acc_dy, acc_dyx):
    i = pl.program_id(1)          # M-tile index (inner)
    n_i = pl.num_programs(1)
    tm, tc = x_ref.shape
    x = x_ref[...].astype(jnp.float32)
    g = g_ref[...].astype(jnp.float32)
    y = x * a_ref[...] + b_ref[...]
    dy = jnp.where(y > 0.0, g, 0.0)
    xhat = x * c_ref[...] + d_ref[...]
    # accumulate into (R, TC) — R=8 keeps the per-tile reduction to plain
    # vector adds along the sublane-group axis; the expensive cross-sublane
    # 8->1 collapse happens ONCE at the end instead of per tile. R=1 is the
    # tiny-tile fallback (tm not a multiple of 8).
    r = acc_dy.shape[0]
    psd = jnp.sum(dy.reshape(tm // r, r, tc), axis=0)
    psx = jnp.sum((dy * xhat).reshape(tm // r, r, tc), axis=0)

    @pl.when(i == 0)
    def _():
        acc_dy[...] = psd
        acc_dyx[...] = psx

    @pl.when(i != 0)
    def _():
        acc_dy[...] += psd
        acc_dyx[...] += psx

    @pl.when(i == n_i - 1)
    def _():
        sdy_ref[...] = jnp.sum(acc_dy[...], axis=0, keepdims=True)
        sdyx_ref[...] = jnp.sum(acc_dyx[...], axis=0, keepdims=True)


# --------------------------------------------------------------------------
# kernel B: dx elementwise   (g, x, consts) -> dx
#   dx = P * (dy - k1 - xhat * k2),  dy = mask(y) * g
# --------------------------------------------------------------------------

def _dx_kernel(g_ref, x_ref, a_ref, b_ref, c_ref, d_ref, p_ref,
               k1_ref, k2_ref, dx_ref):
    x = x_ref[...].astype(jnp.float32)
    g = g_ref[...].astype(jnp.float32)
    y = x * a_ref[...] + b_ref[...]
    dy = jnp.where(y > 0.0, g, 0.0)
    xhat = x * c_ref[...] + d_ref[...]
    dx = p_ref[...] * (dy - k1_ref[...] - xhat * k2_ref[...])
    dx_ref[...] = dx.astype(dx_ref.dtype)


def _pick_tiles(m: int, c: int, dtype_bytes: int = 2):
    """(TM, TC) such that both divide (m, c) and the VMEM working set
    stays under budget. The binding constraint is Mosaic's ~16 MB scoped
    VMEM: each (TM, TC) block spawns ~6 f32 stack temps (x32, g32, y, dy,
    xhat, product) on top of the double-buffered bf16 ins/outs, so cap
    TM*TC at 2^18 elements (f32 temp = 1 MB each)."""
    tc = c
    while tc > 512:
        tc //= 2
    tm = max(16, (1 << 18) // max(tc, 128) // 16 * 16)
    tm = min(tm, m, 2048)
    while m % tm:
        tm //= 2
    tm = max(tm, 16) if m % 16 == 0 else tm
    while m % tm:
        tm -= 1  # degenerate fallback for odd m (tests)
    return tm, tc


def _scal(v, c):
    return v.reshape(1, c).astype(jnp.float32)


def masked_dual_reduce(g2d, x2d, A, B, C, D, interpret=None):
    """(sum_dy, sum_dy_xhat) with dy = g * (A*x+B > 0), xhat = C*x + D."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    m, c = x2d.shape
    tm, tc = _pick_tiles(m, c)
    grid = (c // tc, m // tm)
    sdy, sdyx = pl.pallas_call(
        _masked_reduce_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tm, tc), lambda j, i: (i, j)),
            pl.BlockSpec((tm, tc), lambda j, i: (i, j)),
            pl.BlockSpec((1, tc), lambda j, i: (0, j)),
            pl.BlockSpec((1, tc), lambda j, i: (0, j)),
            pl.BlockSpec((1, tc), lambda j, i: (0, j)),
            pl.BlockSpec((1, tc), lambda j, i: (0, j)),
        ],
        out_specs=[
            pl.BlockSpec((1, tc), lambda j, i: (0, j)),
            pl.BlockSpec((1, tc), lambda j, i: (0, j)),
        ],
        out_shape=(
            jax.ShapeDtypeStruct((1, c), jnp.float32),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((8 if tm % 8 == 0 else 1, tc), jnp.float32),
            pltpu.VMEM((8 if tm % 8 == 0 else 1, tc), jnp.float32),
        ],
        interpret=interpret,
    )(g2d, x2d, _scal(A, c), _scal(B, c), _scal(C, c), _scal(D, c))
    return sdy.reshape(c), sdyx.reshape(c)


def masked_dx(g2d, x2d, A, B, C, D, P, k1, k2, out_dtype, interpret=None):
    """dx = P * (g*mask - k1 - xhat*k2) over (M, C)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    m, c = x2d.shape
    tm, tc = _pick_tiles(m, c)
    grid = (c // tc, m // tm)
    scal = pl.BlockSpec((1, tc), lambda j, i: (0, j))
    return pl.pallas_call(
        _dx_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tm, tc), lambda j, i: (i, j)),
            pl.BlockSpec((tm, tc), lambda j, i: (i, j)),
            scal, scal, scal, scal, scal, scal, scal,
        ],
        out_specs=pl.BlockSpec((tm, tc), lambda j, i: (i, j)),
        out_shape=jax.ShapeDtypeStruct((m, c), out_dtype),
        interpret=interpret,
    )(g2d, x2d, _scal(A, c), _scal(B, c), _scal(C, c), _scal(D, c),
      _scal(P, c), _scal(k1, c), _scal(k2, c))


# --------------------------------------------------------------------------
# custom-VJP op: y = relu(bn(x))  (training mode)
# --------------------------------------------------------------------------

@partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def bn_relu_train(x, scale, bias, eps=1e-5, impl="pallas"):
    y, _, _ = _fwd_impl(x, scale, bias, eps)
    return y


def _fwd_impl(x, scale, bias, eps):
    axes = tuple(range(x.ndim - 1))
    mu = jnp.mean(x, axis=axes, dtype=jnp.float32)
    m2 = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=axes)
    var = m2 - jnp.square(mu)
    inv = jax.lax.rsqrt(var + eps)
    A = inv * scale.astype(jnp.float32)
    B = bias.astype(jnp.float32) - mu * A
    y = jnp.maximum(x * A.astype(x.dtype) + B.astype(x.dtype), 0)
    return y, mu, var


def _bn_relu_fwd(x, scale, bias, eps, impl):
    y, mu, var = _fwd_impl(x, scale, bias, eps)
    inv = jax.lax.rsqrt(var + eps)
    return y, (x, mu, inv, scale, bias)


def _bn_relu_bwd(eps, impl, res, g):
    x, mu, inv, scale, bias = res
    c = x.shape[-1]
    m = x.size // c
    A, B, C, D = _affine_consts(mu, inv, scale, bias)
    x2d, g2d = x.reshape(m, c), g.reshape(m, c)
    if impl == "pallas":
        sum_dy, sum_dy_xhat = masked_dual_reduce(g2d, x2d, A, B, C, D)
        P = scale.astype(jnp.float32) * inv
        dx = masked_dx(
            g2d, x2d, A, B, C, D, P, sum_dy / m, sum_dy_xhat / m, x.dtype
        ).reshape(x.shape)
    else:  # "xla" reference: identical math, XLA codegen
        g32 = g2d.astype(jnp.float32)
        y = x2d.astype(jnp.float32) * A + B
        dy = jnp.where(y > 0, g32, 0.0)
        xhat = x2d.astype(jnp.float32) * C + D
        sum_dy = jnp.sum(dy, axis=0)
        sum_dy_xhat = jnp.sum(dy * xhat, axis=0)
        P = scale.astype(jnp.float32) * inv
        dx = (P * (dy - sum_dy / m - xhat * (sum_dy_xhat / m))).astype(
            x.dtype
        ).reshape(x.shape)
    return dx, sum_dy_xhat.astype(scale.dtype), sum_dy.astype(bias.dtype)


bn_relu_train.defvjp(_bn_relu_fwd, _bn_relu_bwd)


# --------------------------------------------------------------------------
# custom-VJP op: y = relu(bn(x) + residual)  (bottleneck tail)
# --------------------------------------------------------------------------

def _dual_reduce_res_kernel(g_ref, x_ref, r_ref, a_ref, b_ref, c_ref, d_ref,
                            sdy_ref, sdyx_ref, acc_dy, acc_dyx):
    i = pl.program_id(1)
    n_i = pl.num_programs(1)
    x = x_ref[...].astype(jnp.float32)
    g = g_ref[...].astype(jnp.float32)
    y = x * a_ref[...] + b_ref[...] + r_ref[...].astype(jnp.float32)
    dy = jnp.where(y > 0.0, g, 0.0)
    xhat = x * c_ref[...] + d_ref[...]
    psd = jnp.sum(dy, axis=0, keepdims=True)
    psx = jnp.sum(dy * xhat, axis=0, keepdims=True)

    @pl.when(i == 0)
    def _():
        acc_dy[...] = psd
        acc_dyx[...] = psx

    @pl.when(i != 0)
    def _():
        acc_dy[...] += psd
        acc_dyx[...] += psx

    @pl.when(i == n_i - 1)
    def _():
        sdy_ref[...] = acc_dy[...]
        sdyx_ref[...] = acc_dyx[...]


def _dx_res_kernel(g_ref, x_ref, r_ref, a_ref, b_ref, c_ref, d_ref, p_ref,
                   k1_ref, k2_ref, dx_ref, dr_ref):
    x = x_ref[...].astype(jnp.float32)
    g = g_ref[...].astype(jnp.float32)
    y = x * a_ref[...] + b_ref[...] + r_ref[...].astype(jnp.float32)
    dy = jnp.where(y > 0.0, g, 0.0)
    xhat = x * c_ref[...] + d_ref[...]
    dx = p_ref[...] * (dy - k1_ref[...] - xhat * k2_ref[...])
    dx_ref[...] = dx.astype(dx_ref.dtype)
    dr_ref[...] = dy.astype(dr_ref.dtype)


@partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def bn_add_relu_train(x, residual, scale, bias, eps=1e-5, impl="pallas"):
    y, _, _ = _fwd_impl_res(x, residual, scale, bias, eps)
    return y


def _fwd_impl_res(x, residual, scale, bias, eps):
    axes = tuple(range(x.ndim - 1))
    mu = jnp.mean(x, axis=axes, dtype=jnp.float32)
    m2 = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=axes)
    var = m2 - jnp.square(mu)
    inv = jax.lax.rsqrt(var + eps)
    A = inv * scale.astype(jnp.float32)
    B = bias.astype(jnp.float32) - mu * A
    y = jnp.maximum(x * A.astype(x.dtype) + B.astype(x.dtype) + residual, 0)
    return y, mu, var


def _bn_add_relu_fwd(x, residual, scale, bias, eps, impl):
    y, mu, var = _fwd_impl_res(x, residual, scale, bias, eps)
    inv = jax.lax.rsqrt(var + eps)
    return y, (x, residual, mu, inv, scale, bias)


def _bn_add_relu_bwd(eps, impl, res, g):
    x, residual, mu, inv, scale, bias = res
    c = x.shape[-1]
    m = x.size // c
    A, B, C, D = _affine_consts(mu, inv, scale, bias)
    x2d = x.reshape(m, c)
    g2d = g.reshape(m, c)
    r2d = residual.reshape(m, c)
    if impl == "pallas":
        interpret = jax.default_backend() != "tpu"
        tm, tc = _pick_tiles(m, c)
        grid = (c // tc, m // tm)
        blk = pl.BlockSpec((tm, tc), lambda j, i: (i, j))
        scal = pl.BlockSpec((1, tc), lambda j, i: (0, j))
        outv = pl.BlockSpec((1, tc), lambda j, i: (0, j))
        sdy, sdyx = pl.pallas_call(
            _dual_reduce_res_kernel,
            grid=grid,
            in_specs=[blk, blk, blk, scal, scal, scal, scal],
            out_specs=[outv, outv],
            out_shape=(
                jax.ShapeDtypeStruct((1, c), jnp.float32),
                jax.ShapeDtypeStruct((1, c), jnp.float32),
            ),
            scratch_shapes=[
                pltpu.VMEM((1, tc), jnp.float32),
                pltpu.VMEM((1, tc), jnp.float32),
            ],
            interpret=interpret,
        )(g2d, x2d, r2d, _scal(A, c), _scal(B, c), _scal(C, c), _scal(D, c))
        sum_dy, sum_dy_xhat = sdy.reshape(c), sdyx.reshape(c)
        P = scale.astype(jnp.float32) * inv
        dx, dres = pl.pallas_call(
            _dx_res_kernel,
            grid=grid,
            in_specs=[blk, blk, blk, scal, scal, scal, scal, scal, scal,
                      scal],
            out_specs=[blk, blk],
            out_shape=(
                jax.ShapeDtypeStruct((m, c), x.dtype),
                jax.ShapeDtypeStruct((m, c), residual.dtype),
            ),
            interpret=interpret,
        )(g2d, x2d, r2d, _scal(A, c), _scal(B, c), _scal(C, c), _scal(D, c),
          _scal(P, c), _scal(sum_dy / m, c), _scal(sum_dy_xhat / m, c))
        dx = dx.reshape(x.shape)
        dres = dres.reshape(residual.shape)
    else:
        g32 = g2d.astype(jnp.float32)
        y = x2d.astype(jnp.float32) * A + B + r2d.astype(jnp.float32)
        dy = jnp.where(y > 0, g32, 0.0)
        xhat = x2d.astype(jnp.float32) * C + D
        sum_dy = jnp.sum(dy, axis=0)
        sum_dy_xhat = jnp.sum(dy * xhat, axis=0)
        P = scale.astype(jnp.float32) * inv
        dx = (P * (dy - sum_dy / m - xhat * (sum_dy_xhat / m))).astype(
            x.dtype
        ).reshape(x.shape)
        dres = dy.astype(residual.dtype).reshape(residual.shape)
    return (
        dx,
        dres,
        sum_dy_xhat.astype(scale.dtype),
        sum_dy.astype(bias.dtype),
    )


bn_add_relu_train.defvjp(_bn_add_relu_fwd, _bn_add_relu_bwd)


# --------------------------------------------------------------------------
# flax wrappers: BN(+add)+ReLU with running-stat state, drop-in for the
# resnet's bn+relu sites. Param/stat leaf names match flax BatchNorm
# (scale/bias + batch_stats mean/var) so torch-port and checkpoints are
# unaffected.
# --------------------------------------------------------------------------

import flax.linen as nn  # noqa: E402


class BNRelu(nn.Module):
    """y = relu(bn(x)) with the custom-VJP backward (impl= 'pallas'/'xla').

    Per-replica statistics only (like FusedBatchNorm); flax-BN numerics.
    """

    use_running_average: bool = False
    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: object = jnp.float32
    param_dtype: object = jnp.float32
    impl: str = "pallas"

    @nn.compact
    def __call__(self, x, residual=None):
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
        if self.use_running_average:
            inv = jax.lax.rsqrt(ra_var.value + self.epsilon)
            a32 = inv * scale.astype(jnp.float32)
            b32 = bias.astype(jnp.float32) - ra_mean.value * a32
            y = x * a32.astype(self.dtype) + b32.astype(self.dtype)
            if residual is not None:
                y = y + residual
            return jnp.maximum(y, 0)

        if residual is not None:
            y = bn_add_relu_train(x, residual.astype(self.dtype), scale,
                                  bias, self.epsilon, self.impl)
        else:
            y = bn_relu_train(x, scale, bias, self.epsilon, self.impl)
        if not self.is_initializing():
            # stats recomputed outside the VJP for the running update;
            # XLA CSEs them with the forward's identical expressions
            _, mu, var = _fwd_impl(
                jax.lax.stop_gradient(x), scale, bias, self.epsilon
            )
            ra_mean.value = (
                self.momentum * ra_mean.value + (1 - self.momentum) * mu
            )
            ra_var.value = (
                self.momentum * ra_var.value + (1 - self.momentum) * var
            )
        return y
