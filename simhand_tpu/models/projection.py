"""SimCLR projection head: Linear -> BN -> ReLU -> Linear(no bias).

Reference: src/models/unsupervised/simclr_model.py:22-39
(2048 -> 512 -> 128 by default).
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp


class ProjectionHead(nn.Module):
    hidden_dim: int = 512
    output_dim: int = 128
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x.astype(self.dtype)
        x = nn.Dense(self.hidden_dim, dtype=self.dtype, param_dtype=jnp.float32, name="fc1")(x)
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="bn1",
        )(x)
        x = nn.relu(x)
        x = nn.Dense(
            self.output_dim,
            use_bias=False,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="fc2",
        )(x)
        return x.astype(jnp.float32)
