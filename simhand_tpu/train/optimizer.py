"""Optimizer stack: Adam (+ optional LARS trust-ratio wrapper), the
sqrt-scaled learning-rate rule, linear-warmup + cosine schedule, and
bias/BN weight-decay exclusion.

Reference semantics (src/models/base_model.py:59-106):
  * base lr = config.lr * sqrt(1024 * accumulate_grad_batches)
  * Adam, weight decay as L2-into-gradient (torch style, not decoupled),
    excluded for any parameter whose name contains 'bias' or 'bn'
  * optimizer == "LARS": pl_bolts 0.2.2 LARSWrapper (eta=0.02, clip=True,
    eps=1e-8) around Adam + LinearWarmupCosineAnnealingLR
    (warmup_start_lr=0, eta_min=0), stepped per iteration
  * else: CosineAnnealingLR(T_max = total steps)

The LARS wrapper reproduces pl_bolts exactly: per-parameter
    new_lr = eta * ||p|| / (||g|| + ||p|| * wd + eps)
    new_lr = min(new_lr / group_lr, 1)              (clip)
    g <- (g + wd * p) * new_lr
applied to the raw gradient before Adam's moments, with Adam's own weight
decay zeroed (wd folded into the gradient here).
"""
from __future__ import annotations

import dataclasses
import math
from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax


@dataclasses.dataclass(frozen=True)
class OptimizerConfig:
    lr: float = 1e-4
    weight_decay: float = 1e-6
    optimizer: str = "LARS"              # "LARS" | "adam"
    warmup_epochs: int = 10
    epochs: int = 100
    accumulate_grad_batches: int = 1     # reference: num_of_mini_batch
    train_iters_per_epoch: int = 1000
    lars_eta: float = 0.02
    lars_clip: bool = True
    lars_eps: float = 1e-8

    @property
    def base_lr(self) -> float:
        return self.lr * math.sqrt(1024 * self.accumulate_grad_batches)

    @property
    def warmup_steps(self) -> int:
        return (
            self.warmup_epochs
            * self.train_iters_per_epoch
            // self.accumulate_grad_batches
        )

    @property
    def total_steps(self) -> int:
        return (
            self.epochs * self.train_iters_per_epoch // self.accumulate_grad_batches
        )


def wd_mask(params) -> Any:
    """True where weight decay applies: excludes biases and all BN params
    (reference: src/models/base_model.py:32-53 skip_list=['bias', 'bn'])."""

    def decide(path: tuple, _) -> bool:
        keys = [str(getattr(p, "key", getattr(p, "name", p))).lower() for p in path]
        if "bias" in keys[-1]:
            return False
        if any("bn" in k for k in keys):
            return False
        return True

    return jax.tree_util.tree_map_with_path(decide, params)


def make_schedule(cfg: OptimizerConfig) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """Per-step LR schedule matching the reference."""
    if cfg.optimizer == "LARS":
        warmup = optax.linear_schedule(
            init_value=0.0, end_value=cfg.base_lr, transition_steps=cfg.warmup_steps
        )
        cosine = optax.cosine_decay_schedule(
            init_value=cfg.base_lr,
            decay_steps=max(cfg.total_steps - cfg.warmup_steps, 1),
        )
        return optax.join_schedules([warmup, cosine], [cfg.warmup_steps])
    return optax.cosine_decay_schedule(
        init_value=cfg.base_lr, decay_steps=max(cfg.total_steps, 1)
    )


def _lars_transform(
    schedule, eta: float, clip: bool, eps: float, weight_decay: float, mask
) -> optax.GradientTransformation:
    """pl_bolts-0.2.2 LARSWrapper as an optax gradient transformation."""

    def init_fn(params):
        del params
        return optax.ScaleByScheduleState(count=jnp.zeros([], jnp.int32))

    def update_fn(updates, state, params):
        lr = schedule(state.count)

        def one(g, p, apply_wd):
            wd = weight_decay if apply_wd else 0.0
            p_norm = jnp.linalg.norm(p)
            g_norm = jnp.linalg.norm(g)
            new_lr = (eta * p_norm) / (g_norm + p_norm * wd + eps)
            if clip:
                new_lr = jnp.minimum(new_lr / lr, 1.0)
            # pl_bolts leaves the gradient untouched when either norm is 0.
            return jnp.where(
                (p_norm > 0) & (g_norm > 0), (g + wd * p) * new_lr, g
            )

        new_updates = jax.tree.map(
            one, updates, params, mask, is_leaf=lambda x: x is None
        )
        return new_updates, optax.ScaleByScheduleState(count=state.count + 1)

    return optax.GradientTransformation(init_fn, update_fn)


def make_optimizer(cfg: OptimizerConfig, params) -> optax.GradientTransformation:
    """Builds the full optimizer chain for a parameter tree."""
    schedule = make_schedule(cfg)
    mask = wd_mask(params)

    if cfg.optimizer == "LARS":
        tx = optax.chain(
            _lars_transform(
                schedule, cfg.lars_eta, cfg.lars_clip, cfg.lars_eps,
                cfg.weight_decay, mask,
            ),
            optax.scale_by_adam(),
            optax.scale_by_learning_rate(schedule),
        )
    else:
        tx = optax.chain(
            # torch Adam applies weight decay as L2-into-gradient.
            optax.add_decayed_weights(cfg.weight_decay, mask=mask),
            optax.scale_by_adam(),
            optax.scale_by_learning_rate(schedule),
        )

    if cfg.accumulate_grad_batches > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=cfg.accumulate_grad_batches)
    return tx
