"""Training state: params + BN statistics + optimizer state."""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax.training import train_state

from simhand_tpu.train.optimizer import OptimizerConfig, make_optimizer


class TrainState(train_state.TrainState):
    batch_stats: Any = None


def create_train_state(
    model,
    opt_cfg: OptimizerConfig,
    rng: jax.Array,
    input_shape=(2, 128, 128, 3),
) -> TrainState:
    """Initializes model variables and the optimizer chain."""
    variables = model.init(rng, jnp.zeros(input_shape, jnp.float32))
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    tx = make_optimizer(opt_cfg, params)
    return TrainState.create(
        apply_fn=model.apply, params=params, tx=tx, batch_stats=batch_stats
    )
