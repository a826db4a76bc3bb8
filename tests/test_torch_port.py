"""Checkpoint interop: flax <-> torchvision-format state dicts."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from simhand_tpu.models import resnet50
from simhand_tpu.train.torch_port import (
    encoder_to_torch_state_dict,
    load_torch_checkpoint,
    save_torch_checkpoint,
    torch_state_dict_to_encoder,
)


@pytest.fixture(scope="module")
def rn50_vars():
    model = resnet50()
    return model.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)))


def test_export_key_names_match_torchvision(rn50_vars):
    sd = encoder_to_torch_state_dict(
        rn50_vars["params"], rn50_vars["batch_stats"]
    )
    # spot-check the torchvision resnet50 naming contract
    for key in [
        "conv1.weight",
        "bn1.weight", "bn1.bias", "bn1.running_mean", "bn1.running_var",
        "layer1.0.conv1.weight", "layer1.0.bn3.running_var",
        "layer1.0.downsample.0.weight", "layer1.0.downsample.1.weight",
        "layer4.2.conv3.weight", "layer4.2.bn3.bias",
    ]:
        assert key in sd, key
    assert sd["conv1.weight"].shape == (64, 3, 7, 7)
    assert sd["layer1.0.downsample.0.weight"].shape == (256, 64, 1, 1)
    # exactly the conv/bn params of torchvision rn50 minus fc:
    # 23,508,032 weights + running stats
    n_params = sum(
        v.size for k, v in sd.items() if "running" not in k
    )
    assert n_params == 23_508_032


def test_round_trip_identity(rn50_vars):
    sd = encoder_to_torch_state_dict(
        rn50_vars["params"], rn50_vars["batch_stats"]
    )
    params, stats = torch_state_dict_to_encoder(sd)

    flat_a = jax.tree_util.tree_leaves_with_path(rn50_vars["params"])
    flat_b = dict(jax.tree_util.tree_flatten_with_path(params)[0])
    for path, a in flat_a:
        b = flat_b[path]
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    flat_sa = jax.tree_util.tree_leaves_with_path(rn50_vars["batch_stats"])
    flat_sb = dict(jax.tree_util.tree_flatten_with_path(stats)[0])
    for path, a in flat_sa:
        np.testing.assert_array_equal(np.asarray(a), np.asarray(flat_sb[path]))


def test_torch_file_round_trip(rn50_vars, tmp_path):
    torch = pytest.importorskip("torch")
    path = os.path.join(tmp_path, "enc.pth")
    save_torch_checkpoint(
        path, jax.device_get(rn50_vars["params"]),
        jax.device_get(rn50_vars["batch_stats"]),
    )
    params, stats = load_torch_checkpoint(path)
    # loaded params run a forward pass
    model = resnet50()
    out = model.apply(
        {"params": params, "batch_stats": stats}, jnp.zeros((1, 32, 32, 3))
    )
    assert out.shape == (1, 2048)
    # ignores fc.* keys and num_batches_tracked if present
    sd = torch.load(path, map_location="cpu", weights_only=True)
    sd["fc.weight"] = torch.zeros(1000, 2048)
    sd["bn1.num_batches_tracked"] = torch.tensor(0)
    params2, _ = torch_state_dict_to_encoder(
        {k: v.numpy() for k, v in sd.items()}
    )
    assert "fc" not in params2


def test_detnet_round_trip():
    from simhand_tpu.finetune.detnet import DetNet
    from simhand_tpu.finetune.torch_port_detnet import (
        detnet_to_torch_state_dict,
        torch_state_dict_to_detnet,
    )

    model = DetNet(resnet_size="50")
    variables = model.init(jax.random.key(1), jnp.zeros((1, 128, 128, 3)))
    sd = detnet_to_torch_state_dict(
        jax.device_get(variables["params"]),
        jax.device_get(variables["batch_stats"]),
    )
    for key in [
        "encoder.resnet.conv1.weight", "deconv.0.weight", "deconv.1.running_mean",
        "hmap_0.project.0.weight", "hmap_0.prediction.bias",
        "lmap_0.prediction.weight",
    ]:
        assert key in sd, key
    assert sd["deconv.0.weight"].shape == (2048, 256, 4, 4)
    assert sd["hmap_0.prediction.weight"].shape == (21, 256, 1, 1)

    params, stats = torch_state_dict_to_detnet(sd)
    # round trip is exact, and the model runs on the reloaded tree
    got = np.asarray(params["deconv0"]["kernel"])
    want = np.asarray(variables["params"]["deconv0"]["kernel"])
    np.testing.assert_array_equal(got, want)
    out = model.apply(
        {"params": params, "batch_stats": stats}, jnp.zeros((1, 128, 128, 3))
    )
    ref = model.apply(variables, jnp.zeros((1, 128, 128, 3)))
    np.testing.assert_allclose(
        np.asarray(out["h_map"]), np.asarray(ref["h_map"]), rtol=1e-5, atol=1e-6
    )


def test_hub_load_into_contrastive(tmp_path):
    pytest.importorskip("torch")
    import os

    from simhand_tpu.hub import load_encoder_into_contrastive
    from simhand_tpu.models import ContrastiveModel

    model = ContrastiveModel(resnet_size="50")
    variables = model.init(jax.random.key(2), jnp.zeros((1, 32, 32, 3)))
    path = os.path.join(tmp_path, "rel.pth")
    save_torch_checkpoint(
        path, jax.device_get(variables["params"]["encoder"]),
        jax.device_get(variables["batch_stats"]["encoder"]),
    )
    fresh = model.init(jax.random.key(3), jnp.zeros((1, 32, 32, 3)))
    loaded = load_encoder_into_contrastive(fresh, path)
    a = jax.tree.leaves(variables["params"]["encoder"])[0]
    b = jax.tree.leaves(loaded["params"]["encoder"])[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # the model runs with the transplanted encoder
    emb, proj = model.apply(loaded, jnp.zeros((1, 32, 32, 3)))
    assert proj.shape == (1, 128)


def test_root_hubconf_surface(tmp_path):
    """Repo-root hubconf.py (the reference's torch.hub surface): the flax
    entry loads an exported .pth; the torch entry exists with the
    reference's signature (torchvision-gated in this image)."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "repo_hubconf",
        os.path.join(os.path.dirname(os.path.dirname(__file__)), "hubconf.py"),
    )
    hub = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(hub)
    assert "torch" in hub.dependencies
    assert callable(hub.resnet50_simhand)

    import numpy as np
    import torch

    from test_torch_contract import make_state_dict

    pth = str(tmp_path / "enc.pth")
    torch.save(
        {k: torch.from_numpy(np.atleast_1d(v)) for k, v in
         make_state_dict(1).items()},
        pth,
    )
    params, stats = hub.resnet50_simhand_flax(pth)
    assert "conv1" in params and "mean" in stats["bn1"]
