"""Metric logging: console + TensorBoard + optional Comet + experiment
registry.

Replaces the reference's dual CometLogger/TensorBoardLogger stack
(src/experiments/main.py:107-122, src/models/callbacks/) with one
façade. Comet activates only when COMET_API_KEY is set (reference keys
its logger off env vars the same way, src/constants.py:28-33).
"""
from __future__ import annotations

import csv
import logging
import os
import time

logger = logging.getLogger("simhand_tpu.metrics")


class MetricLogger:
    def __init__(self, experiment_name: str, tb_dir: str | None = None,
                 tags: list[str] | None = None):
        self.experiment_name = experiment_name
        self._tb = None
        self._comet = None
        if tb_dir:
            try:
                import tensorflow as tf

                path = os.path.join(tb_dir, experiment_name)
                self._tb = tf.summary.create_file_writer(path)
            except Exception as e:  # pragma: no cover
                logger.warning("TensorBoard logging disabled: %s", e)
        if os.environ.get("COMET_API_KEY"):
            try:  # pragma: no cover - needs network
                import comet_ml

                self._comet = comet_ml.Experiment(
                    api_key=os.environ["COMET_API_KEY"],
                    project_name=os.environ.get("COMET_PROJECT", "simhand-tpu"),
                )
                self._comet.set_name(experiment_name)
                for t in tags or []:
                    self._comet.add_tag(t)
            except Exception as e:
                logger.warning("Comet logging disabled: %s", e)

    def log_metrics(self, metrics: dict, step: int) -> None:
        msg = " ".join(f"{k}={float(v):.5f}" for k, v in metrics.items())
        logger.info("step %d %s", step, msg)
        if self._tb is not None:
            import tensorflow as tf

            with self._tb.as_default():
                for k, v in metrics.items():
                    tf.summary.scalar(k, float(v), step=step)
                self._tb.flush()
        if self._comet is not None:  # pragma: no cover
            self._comet.log_metrics(
                {k: float(v) for k, v in metrics.items()}, step=step
            )

    def log_figure(self, name: str, fig, step: int) -> None:
        """Pushes a matplotlib figure (the reference's UploadCometLogs
        sample-pair figures, src/models/callbacks/upload_comet_logs.py)."""
        if self._tb is not None:
            import io

            import numpy as np
            import tensorflow as tf

            buf = io.BytesIO()
            fig.savefig(buf, format="png", dpi=80)
            buf.seek(0)
            img = tf.image.decode_png(buf.getvalue(), channels=4)
            with self._tb.as_default():
                tf.summary.image(name, img[None], step=step)
                self._tb.flush()
        if self._comet is not None:  # pragma: no cover
            self._comet.log_figure(figure_name=name, figure=fig, step=step)

    def close(self):
        if self._comet is not None:  # pragma: no cover
            self._comet.end()


def register_experiment(meta_file: str, experiment_name: str,
                        key: str | None = None) -> None:
    """Appends (name, key, timestamp) to the experiment registry CSV
    (reference: src/experiments/utils.py:465-478)."""
    os.makedirs(os.path.dirname(os.path.abspath(meta_file)), exist_ok=True)
    new = not os.path.exists(meta_file)
    with open(meta_file, "a", newline="") as f:
        w = csv.writer(f)
        if new:
            w.writerow(["experiment_name", "experiment_key", "timestamp"])
        w.writerow([experiment_name, key or "", time.strftime("%Y-%m-%d %H:%M:%S")])


def setup_debug_logging(log_dir: str, experiment_name: str) -> logging.Logger:
    """Opt-in file debug logger (reference: experiments/utils.py:759-770)."""
    os.makedirs(log_dir, exist_ok=True)
    lg = logging.getLogger(f"simhand_tpu.debug.{experiment_name}")
    lg.setLevel(logging.DEBUG)
    fh = logging.FileHandler(os.path.join(log_dir, f"{experiment_name}.log"))
    fh.setFormatter(
        logging.Formatter("%(asctime)s %(levelname)s %(message)s")
    )
    lg.addHandler(fh)
    return lg
