"""Max-pool with a recompute-and-mask backward (no select_and_scatter).

XLA lowers the gradient of ``lax.reduce_window(max)`` to a
``select-and-scatter`` op that runs as its own non-fused kernel on TPU
(~1.0 ms/step for the ResNet stem pool in the rn18 profile — the single
most expensive non-fused op there, and a fixed ~1.5% of the rn50 step).
This module keeps the identical forward but routes the backward through a
custom VJP built only from strided slices, compares, and strided
pad/adds — shapes XLA fuses into cheap vectorized elementwise kernels.

Semantics: gradient is routed to the FIRST maximal element of each
window in row-major window order. That is torch's ``F.max_pool2d``
tie-break (gradient to the argmax index, first occurrence), so under
ties — common after ReLU, where exact zeros repeat — this path matches
the reference backbone (torchvision resnet ``maxpool``,
/root/reference/src/models/resnet_model.py via torchvision) at least as
closely as XLA's own scatter.

Opt-in: ``ResNet(maxpool="masked")`` / ``BENCH_MAXPOOL=masked``.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

Window = tuple[int, int]
Padding = tuple[tuple[int, int], tuple[int, int]]


def _reduce_max(x, window: Window, strides: Window, padding: Padding):
    return lax.reduce_window(
        x,
        -jnp.inf if jnp.issubdtype(x.dtype, jnp.inexact) else jnp.iinfo(x.dtype).min,
        lax.max,
        (1, *window, 1),
        (1, *strides, 1),
        ((0, 0), *padding, (0, 0)),
    )


@partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def max_pool_firstmatch(
    x,
    window: Window = (3, 3),
    strides: Window = (2, 2),
    padding: Padding = ((1, 1), (1, 1)),
):
    """NHWC max-pool, identical forward to ``nn.max_pool``; backward is
    the masked recompute above instead of XLA's select_and_scatter."""
    return _reduce_max(x, window, strides, padding)


def _fwd(x, window, strides, padding):
    y = _reduce_max(x, window, strides, padding)
    return y, (x, y)


def _bwd(window, strides, padding, res, g):
    x, y = res
    wh, ww = window
    sh, sw = strides
    (ph0, ph1), (pw0, pw1) = padding
    n, h, w, c = x.shape
    oh, ow = y.shape[1], y.shape[2]

    # Pad with -inf so padded taps can never claim a window's gradient
    # (every window here contains at least one real element).
    xp = jnp.pad(
        x, ((0, 0), (ph0, ph1), (pw0, pw1), (0, 0)), constant_values=-jnp.inf
    )
    dxp = jnp.zeros(xp.shape, jnp.float32)
    claimed = jnp.zeros(y.shape, bool)
    gf = g.astype(jnp.float32)
    for a in range(wh):
        for b in range(ww):
            # tap (a, b) of every window, as one strided slice of xp
            x_tap = lax.slice(
                xp,
                (0, a, b, 0),
                (n, a + sh * (oh - 1) + 1, b + sw * (ow - 1) + 1, c),
                (1, sh, sw, 1),
            )
            m = (x_tap == y) & ~claimed
            claimed = claimed | m
            dxp = dxp.at[
                :, a : a + sh * (oh - 1) + 1 : sh,
                b : b + sw * (ow - 1) + 1 : sw, :
            ].add(jnp.where(m, gf, 0.0))
    dx = dxp[:, ph0 : ph0 + h, pw0 : pw0 + w, :].astype(x.dtype)
    return (dx,)


max_pool_firstmatch.defvjp(_fwd, _bwd)
