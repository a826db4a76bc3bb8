"""TPU-tuned BatchNorm.

Round-1 profiling (see CLAUDE.md): BN statistics + gradient reductions
(`convert_reduce_fusion`) are ~50% of the rn50@128² train step — the
activations are re-read for every mean/var pass. ``SubsampledBatchNorm``
computes the *forward* batch statistics from a strided row subset
(batch 256 -> stats from 64 rows is statistically equivalent for BN), and
only reads the subset: the fwd stats traffic drops by the subsample
factor. Normalization, running averages and the backward pass are
unchanged (gradients stay exact for the subsampled-stats loss).

Opt-in (``ContrastiveModel(bn_subsample=4)``); default BN matches the
reference semantics exactly.
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp


class SubsampledBatchNorm(nn.Module):
    """BatchNorm with strided-subset forward statistics."""

    subsample: int = 4
    # stop gradients through mean/var (the "no-backprop-through-stats"
    # BN variant): the backward collapses to dgamma/dbeta reduces only.
    stop_gradient_stats: bool = False
    use_running_average: bool = False
    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32
    axis_name: str | None = None

    @nn.compact
    def __call__(self, x, use_running_average: bool | None = None):
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

        if use_ra:
            mean = ra_mean.value
            var = ra_var.value
        else:
            # contiguous leading rows: the batch is shuffled, so this is a
            # uniform subset, and the slice's backward is a cheap pad
            # (a strided x[::k] backward lowers to a scatter — measured
            # 1.6x SLOWER than exact BN)
            n_sub = max(x.shape[0] // self.subsample, 1)
            sub = x[:n_sub] if self.subsample > 1 else x
            sub32 = sub.astype(jnp.float32)
            axes = tuple(range(sub32.ndim - 1))
            mean = jnp.mean(sub32, axis=axes)
            mean2 = jnp.mean(jnp.square(sub32), axis=axes)
            if self.axis_name is not None:
                mean = jax.lax.pmean(mean, self.axis_name)
                mean2 = jax.lax.pmean(mean2, self.axis_name)
            var = jnp.maximum(mean2 - jnp.square(mean), 0.0)
            if not self.is_initializing():
                ra_mean.value = (
                    self.momentum * ra_mean.value + (1 - self.momentum) * mean
                )
                ra_var.value = (
                    self.momentum * ra_var.value + (1 - self.momentum) * var
                )

        if self.stop_gradient_stats and not use_ra:
            mean = jax.lax.stop_gradient(mean)
            var = jax.lax.stop_gradient(var)
        # fold stats+affine into one per-channel multiply-add applied in
        # the compute dtype — fuses into the producing conv's epilogue,
        # no extra f32 activation pass
        inv = jax.lax.rsqrt(var + self.epsilon)
        a = (inv * scale.astype(jnp.float32)).astype(self.dtype)
        b = (
            bias.astype(jnp.float32) - mean * inv * scale.astype(jnp.float32)
        ).astype(self.dtype)
        return x.astype(self.dtype) * a + b
