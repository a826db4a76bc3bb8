"""Orbax checkpointing + torch-format encoder export.

Replaces the reference's Lightning ModelCheckpoint (main.py:143-149,
monitor='contrastive_loss', save_top_k) with an orbax CheckpointManager
keyed on the same metric, plus ``export_torch_encoder`` so released
recipes and torch.hub consumers load our encoders unchanged
(reference contract: port_model.py / hubconf.py).
"""
from __future__ import annotations

import logging
import os
from typing import Any

import jax
import orbax.checkpoint as ocp

from simhand_tpu.train.torch_port import save_torch_checkpoint


class CheckpointManager:
    """Thin wrapper over orbax with best-metric tracking.

    Keeps ``save_top_k`` checkpoints ordered by ``contrastive_loss`` (min),
    mirroring the reference's checkpoint policy.
    """

    def __init__(self, directory: str, save_top_k: int = 1, metric: str = "contrastive_loss"):
        directory = os.path.abspath(directory)
        os.makedirs(directory, exist_ok=True)
        self.metric = metric
        self.directory = directory
        options = ocp.CheckpointManagerOptions(
            max_to_keep=max(save_top_k, 1),
            best_fn=lambda m: m[metric],
            best_mode="min",
            create=True,
        )
        self._mgr = ocp.CheckpointManager(directory, options=options)

    def save(self, step: int, state, metrics: dict[str, float]) -> None:
        # the reference's UpdatedModelCheckpoint announces every save
        # (callbacks/model_checkpoint.py:5-10 "Saving checkpoint at ...")
        logging.getLogger("simhand_tpu").info(
            "Saving checkpoint at %s (step %d, %s=%.6f)",
            self.directory, step, self.metric, float(metrics[self.metric]),
        )
        self._mgr.save(
            step,
            args=ocp.args.StandardSave(jax.tree.map(lambda x: x, state)),
            metrics={self.metric: float(metrics[self.metric])},
        )

    def restore(self, state_template, step: int | None = None):
        step = self.latest_step() if step is None else step
        if step is None:
            return None
        return self._mgr.restore(step, args=ocp.args.StandardRestore(state_template))

    def restore_tree(self, step: int | None = None):
        """Template-free restore: the saved pytree as nested dicts of
        numpy arrays. Lets eval-time consumers pick ``params`` /
        ``batch_stats`` without reconstructing the training optimizer
        state structure."""
        step = self.latest_step() if step is None else step
        if step is None:
            return None
        return self._mgr.restore(step)

    def latest_step(self) -> int | None:
        return self._mgr.latest_step()

    def all_steps(self) -> list[int]:
        return sorted(self._mgr.all_steps())

    def best_step(self) -> int | None:
        return self._mgr.best_step()

    def wait(self):
        self._mgr.wait_until_finished()

    def close(self):
        self._mgr.close()


def export_torch_encoder(state: Any, path: str) -> None:
    """Exports the encoder sub-tree of a TrainState in torch format."""
    params = jax.device_get(state.params)["encoder"]
    stats = jax.device_get(state.batch_stats).get("encoder", {})
    save_torch_checkpoint(path, params, stats)
