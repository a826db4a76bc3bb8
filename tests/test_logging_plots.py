import os

import numpy as np

from simhand_tpu.utils.logging import MetricLogger, register_experiment
from simhand_tpu.utils.plots import (
    denormalize,
    heatmaps_vis,
    plot_pair_images,
    plot_pck_curve,
    plot_truth_vs_prediction,
)


def test_metric_logger_tb(tmp_path):
    lg = MetricLogger("exp1", tb_dir=str(tmp_path))
    lg.log_metrics({"loss": 1.5}, step=1)
    fig = plot_pck_curve(np.linspace(0, 1, 10), np.linspace(0, 0.5, 10))
    lg.log_figure("pck", fig, step=1)
    lg.close()
    files = os.listdir(tmp_path / "exp1")
    assert any("tfevents" in f for f in files)


def test_register_experiment(tmp_path):
    meta = str(tmp_path / "registry.csv")
    register_experiment(meta, "exp-a", key="k1")
    register_experiment(meta, "exp-b")
    lines = open(meta).read().strip().splitlines()
    assert lines[0].startswith("experiment_name")
    assert len(lines) == 3


def test_plot_helpers_render():
    rng = np.random.default_rng(0)
    img = rng.normal(size=(128, 128, 3)).astype(np.float32)
    joints = rng.uniform(0, 128, (21, 3)).astype(np.float32)
    fig = plot_pair_images(img, img, joints, joints, title="pair")
    assert fig is not None
    fig2 = plot_truth_vs_prediction(joints, joints + 2, img)
    assert fig2 is not None
    d = denormalize(img)
    assert d.min() >= 0 and d.max() <= 1


def test_heatmaps_vis_io_mode(tmp_path):
    """hp_vis.py:heatmaps_vis parity: 'IO' mode writes
    batch_idx_<i>/combined_{1,2}.png (original | colormapped heatmap);
    non-IO modes raise, matching the reference's only-implemented mode."""
    import pytest

    rng = np.random.default_rng(0)
    batch = {
        "transformed_image1": rng.uniform(0, 1, (1, 32, 32, 3)).astype(np.float32),
        "transformed_image2": rng.uniform(0, 2, (1, 32, 32, 3)).astype(np.float32),
    }
    enc = rng.normal(size=(2, 8, 8)).astype(np.float32)
    paths = heatmaps_vis(3, batch, enc, str(tmp_path))
    assert [os.path.basename(p) for p in paths] == ["combined_1.png", "combined_2.png"]
    assert all(os.path.dirname(p).endswith("batch_idx_3") for p in paths)
    assert all(os.path.getsize(p) > 0 for p in paths)
    with pytest.raises(NotImplementedError):
        heatmaps_vis(0, batch, enc, str(tmp_path), vis_type="P")
