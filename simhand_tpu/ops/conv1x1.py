"""Pallas 1x1-conv (matmul) with fused BN-statistics epilogue.

The round-2 structural experiment: rn50's 1x1 convs are BANDWIDTH-bound
(e.g. layer1 conv3: 17 GFLOP = 0.09 ms of MXU vs 0.34 GB = 0.41 ms of
HBM traffic), and XLA's structure per conv+BN site is

    conv custom-call (write y raw) -> convert_reduce_fusion (read y,
    write y relaid + f32 stat sums) -> apply fusion (read y', write a)

i.e. ~5 plane traversals. A matmul kernel that emits y ONCE with the
stat sums accumulated in its epilogue cuts that to [read x, write y]
(+ the apply pass), because the reduction rides the MXU output while it
is still in VMEM. Measured by scripts/bench_conv1x1.py.

Layout: x (M, Cin) bf16, w (Cin, Cout) bf16 -> y (M, Cout) bf16,
sum/sumsq (Cout,) f32 — NHWC 1x1 conv flattened over batch*spatial.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _matmul_stats_kernel(x_ref, w_ref, y_ref, s1_ref, s2_ref,
                         acc1, acc2):
    i = pl.program_id(1)                  # M-tile (inner)
    n_i = pl.num_programs(1)
    y = jnp.dot(x_ref[...], w_ref[...], preferred_element_type=jnp.float32)
    _stats_epilogue(y, y_ref, s1_ref, s2_ref, acc1, acc2, i, n_i)


def _affine_matmul_stats_kernel(x_ref, w_ref, a_ref, b_ref,
                                y_ref, s1_ref, s2_ref, acc1, acc2):
    """The fused-loader variant: the INPUT is the previous layer's raw
    conv output; its BN-apply + ReLU (x*A+B, clamped) happens on the
    loaded block before the matmul — the producing layer's activation is
    never materialized post-BN. A, B are per-cin-channel f32."""
    i = pl.program_id(1)
    n_i = pl.num_programs(1)
    x = jnp.maximum(
        x_ref[...].astype(jnp.float32) * a_ref[...] + b_ref[...], 0.0
    ).astype(x_ref.dtype)
    y = jnp.dot(x, w_ref[...], preferred_element_type=jnp.float32)
    _stats_epilogue(y, y_ref, s1_ref, s2_ref, acc1, acc2, i, n_i)


def _stats_epilogue(y, y_ref, s1_ref, s2_ref, acc1, acc2, i, n_i):
    y_bf = y.astype(y_ref.dtype)
    y_ref[...] = y_bf
    # statistics of the ROUNDED activations — bit-matching XLA's pipeline,
    # whose reduce fusion reads the materialized bf16 y
    y32 = y_bf.astype(jnp.float32)
    tm, tc = y.shape
    r = acc1.shape[0]
    ps1 = jnp.sum(y32.reshape(tm // r, r, tc), axis=0)
    ps2 = jnp.sum(jnp.square(y32).reshape(tm // r, r, tc), axis=0)

    @pl.when(i == 0)
    def _():
        acc1[...] = ps1
        acc2[...] = ps2

    @pl.when(i != 0)
    def _():
        acc1[...] += ps1
        acc2[...] += ps2

    @pl.when(i == n_i - 1)
    def _():
        s1_ref[...] = jnp.sum(acc1[...], axis=0, keepdims=True)
        s2_ref[...] = jnp.sum(acc2[...], axis=0, keepdims=True)


def _stats_call(kernel, x2d, w, extra_ops=(), interpret=None):
    """Shared tile-sizing/grid/spec plumbing for the stats-epilogue
    matmul entry points (one place for the VMEM heuristic and the
    cout-divisibility guard)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    m, cin = x2d.shape
    cout = w.shape[1]
    tc = min(cout, 512)
    # VMEM per m-tile ~ (cin + 2*tc) columns of bf16 (x block + y block,
    # double-buffered) + f32 matmul accumulator; size tm so the working
    # set stays ~4 MB — small-K shapes get much taller tiles (fewer,
    # larger DMAs)
    tm = max(16, (1 << 21) // max(cin + 2 * tc, 256))
    tm = 1 << (tm.bit_length() - 1)          # power of two
    tm = min(tm, m, 8192)
    while m % tm:
        tm //= 2
    if cout % tc:
        raise ValueError(
            f"cout={cout} must be a multiple of the channel tile {tc} "
            "(a floored grid would leave output columns unwritten)"
        )
    grid = (cout // tc, m // tm)
    r = 8 if tm % 8 == 0 else 1
    scal_in = pl.BlockSpec((1, cin), lambda j, i: (0, 0))
    y, s1, s2 = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tm, cin), lambda j, i: (i, 0)),
            pl.BlockSpec((cin, tc), lambda j, i: (0, j)),
        ] + [scal_in] * len(extra_ops),
        out_specs=[
            pl.BlockSpec((tm, tc), lambda j, i: (i, j)),
            pl.BlockSpec((1, tc), lambda j, i: (0, j)),
            pl.BlockSpec((1, tc), lambda j, i: (0, j)),
        ],
        out_shape=(
            jax.ShapeDtypeStruct((m, cout), x2d.dtype),
            jax.ShapeDtypeStruct((1, cout), jnp.float32),
            jax.ShapeDtypeStruct((1, cout), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((r, tc), jnp.float32),
            pltpu.VMEM((r, tc), jnp.float32),
        ],
        interpret=interpret,
    )(x2d, w, *extra_ops)
    return y, s1.reshape(cout), s2.reshape(cout)


def conv1x1_stats(x2d, w, interpret=None):
    """y = x2d @ w (bf16 out) + per-channel (sum, sumsq) f32 epilogue."""
    return _stats_call(_matmul_stats_kernel, x2d, w, interpret=interpret)


def conv1x1_bn_relu_stats(x2d, w, A, B, interpret=None):
    """y = relu(x2d * A + B) @ w with stats epilogue — the fused-loader
    chain link: consumes the PREVIOUS conv's raw output and applies its
    BN+ReLU on the fly, so that activation is never written post-BN.
    A, B: per-cin-channel f32 (scale*inv, bias - mu*scale*inv)."""
    cin = x2d.shape[1]
    return _stats_call(
        _affine_matmul_stats_kernel, x2d, w,
        extra_ops=(A.reshape(1, cin).astype(jnp.float32),
                   B.reshape(1, cin).astype(jnp.float32)),
        interpret=interpret,
    )
