"""Checkpoint manager: save/restore/best-metric policy round trips."""
import jax
import jax.numpy as jnp
import numpy as np

from simhand_tpu.models import ContrastiveModel
from simhand_tpu.train import OptimizerConfig, create_train_state
from simhand_tpu.train.checkpoint import CheckpointManager, export_torch_encoder


def make_state():
    model = ContrastiveModel(resnet_size="18")
    cfg = OptimizerConfig(train_iters_per_epoch=4, epochs=2, warmup_epochs=1)
    return create_train_state(model, cfg, jax.random.key(0),
                              input_shape=(2, 32, 32, 3))


def test_save_restore_round_trip(tmp_path):
    state = make_state()
    mgr = CheckpointManager(str(tmp_path / "ckpt"), save_top_k=2)
    mgr.save(1, jax.device_get(state), {"contrastive_loss": 5.0})
    mgr.wait()
    assert mgr.latest_step() == 1

    restored = mgr.restore(jax.device_get(state))
    a = jax.tree.leaves(state.params)[0]
    b = jax.tree.leaves(restored.params)[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    mgr.close()


def test_best_metric_policy(tmp_path):
    state = jax.device_get(make_state())
    mgr = CheckpointManager(str(tmp_path / "ckpt"), save_top_k=1)
    mgr.save(1, state, {"contrastive_loss": 5.0})
    mgr.wait()
    mgr.save(2, state, {"contrastive_loss": 3.0})
    mgr.wait()
    mgr.save(3, state, {"contrastive_loss": 4.0})
    mgr.wait()
    # best (min loss) checkpoint is step 2
    assert mgr.best_step() == 2
    mgr.close()


def test_export_torch_encoder_from_state(tmp_path):
    import torch

    state = jax.device_get(make_state())
    path = str(tmp_path / "enc.pth")
    export_torch_encoder(state, path)
    sd = torch.load(path, map_location="cpu", weights_only=True)
    assert "conv1.weight" in sd
    assert sd["conv1.weight"].shape == (64, 3, 7, 7)
