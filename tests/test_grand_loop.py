"""Grand-loop integration: the full reference workflow in one run.

similarity mining CLI (Hand100M pairing) -> pretrain CLI (simhand_w on
the mined pairs) -> --export_torch .pth -> finetune.train --pretrain
<that .pth> -> finetune.evaluate — every cross-stage contract (mined
v1-1 annotation schema consumed by the pretrain pipeline; exported
torchvision key layout consumed by the fine-tune init path) exercised
end to end, with proof that the exported encoder weights actually
landed in the detnet backbone rather than being silently re-initialized.

Reference workflow: Hand100M/README (mining produces the *_v1-1.json
corpora) -> README.md:55-76 (pre-train + port_model export) ->
minimal-hand/README.md:19-27 (fine-tune from the released .pth).
"""
import json
import os
import sys

import numpy as np
import pytest


def _run_pretrain(tmp_root, extra):
    from simhand_tpu.experiments import main as main_mod

    argv = [
        "main.py", "--experiment_type", "simhand_w", "--crop", "--resize",
        "--rotate", "-sources", "synthetic", "-batch_size", "8",
        "-resnet_size", "18",
        "--data_dir", os.path.join(tmp_root, "data"),
        "-experiment_name", "grand_loop",
    ] + extra
    old = sys.argv
    sys.argv = argv
    try:
        return main_mod.main()
    finally:
        sys.argv = old


def _tree_max_abs_diff(a, b):
    import jax

    leaves_a = jax.tree.leaves(a)
    leaves_b = jax.tree.leaves(b)
    assert len(leaves_a) == len(leaves_b) and leaves_a
    return max(
        float(np.max(np.abs(np.asarray(x, np.float32) -
                            np.asarray(y, np.float32))))
        for x, y in zip(leaves_a, leaves_b)
    )


@pytest.mark.filterwarnings("ignore")
@pytest.mark.slow
def test_grand_loop_mine_pretrain_export_finetune_eval(tmp_path, monkeypatch):
    torch = pytest.importorskip("torch")
    monkeypatch.setenv("BASE_PATH", str(tmp_path / "runs"))
    import importlib

    import simhand_tpu.constants as constants

    importlib.reload(constants)
    import simhand_tpu.experiments.main as main_mod

    importlib.reload(main_mod)

    # --- stage 0: mine the similar-hand positives the pretrain consumes ---
    # Generate the synthetic corpus at the exact path `-sources synthetic`
    # reads, strip its pairs, and re-create them through the real mining
    # CLI — the pretrain below trains on MINED pairs, not generator ones.
    from simhand_tpu.data.sources import generate_synthetic_hand100m
    from simhand_tpu.mining import run as mining_run

    synth_root = os.path.join(str(tmp_path), "data", "synthetic")
    anno_path = generate_synthetic_hand100m(
        synth_root, num_images=256, num_videos=16
    )
    with open(anno_path) as f:
        corpus = json.load(f)
    oracle = [a["positive_sample"][0] for a in corpus["annotations"]]
    for a in corpus["annotations"]:
        a["positive_sample"] = []
        a["distance"] = []
    unpaired = str(tmp_path / "unpaired.json")
    with open(unpaired, "w") as f:
        json.dump(corpus, f)
    mining_run.main([
        "--input", unpaired, "--output", anno_path,
        "--k", "1", "--query_chunk", "64", "--db_chunk", "128",
    ])
    with open(anno_path) as f:
        mined = json.load(f)
    assert [a["positive_sample"][0] for a in mined["annotations"]] == oracle

    # --- stage 1: pre-train (simhand_w, rn18, 2 steps) + torch export ---
    pth = str(tmp_path / "encoder_simhand.pth")
    state = _run_pretrain(
        str(tmp_path), ["-epochs", "1", "--max_steps", "2",
                        "--export_torch", pth]
    )
    assert int(np.asarray(state.step)) == 2
    assert os.path.exists(pth)

    # exported artifact is a torchvision-layout state dict (the released
    # resnet50_simhand.pth shape of contract, hubconf.py:6-23)
    sd = torch.load(pth, map_location="cpu", weights_only=True)
    assert "conv1.weight" in sd and "layer4.1.bn2.running_var" in sd
    # the exported tensors are the PRETRAINED encoder, not an init: they
    # must match the final pretrain state's encoder subtree bit-for-bit
    from simhand_tpu.train.torch_port import load_torch_checkpoint

    enc_params, enc_stats = load_torch_checkpoint(pth)
    import jax

    pre_enc = jax.device_get(state.params)["encoder"]
    assert _tree_max_abs_diff(enc_params, pre_enc) == 0.0

    # --- stage 2: fine-tune detnet from the exported .pth (1 step) ---
    from simhand_tpu.finetune.train import main as train_main

    out_dir = str(tmp_path / "detnet_out")
    ft_state = train_main([
        "--dataset", "synthetic", "--backbone", "18",
        "--epochs", "1", "--batch_size", "8", "--max_steps", "1",
        "--eval_every", "5", "--out_dir", out_dir,
        "--pretrain", pth,
    ])
    assert ft_state is not None

    # the exported encoder LANDED in the detnet backbone: after exactly
    # one adam step (lr 1e-4, update magnitude ~lr per param) the
    # backbone sits within a few lr of the exported weights...
    ft_enc = jax.device_get(ft_state.params)["encoder"]
    drift = _tree_max_abs_diff(ft_enc, enc_params)
    assert 0.0 < drift < 5e-3, drift
    # ...and far from what a silent re-init would leave there
    import jax.numpy as jnp

    from simhand_tpu.finetune.detnet import DetNet

    fresh = DetNet(resnet_size="18", dtype=jnp.bfloat16).init(
        jax.random.key(0), jnp.zeros((1, 128, 128, 3))
    )["params"]["encoder"]
    assert _tree_max_abs_diff(fresh, enc_params) > 1e-2

    # --- stage 3: evaluate the fine-tuned checkpoint via the eval CLI ---
    from simhand_tpu.finetune.evaluate import main as eval_main

    metrics = eval_main([
        "--dataset", "synthetic", "--backbone", "18",
        "--checkpoint", os.path.join(out_dir, "checkpoints"),
        "--batch_size", "8", "--max_batches", "1",
    ])
    finite = {k: v for k, v in metrics.items()
              if isinstance(v, (int, float))}
    assert finite and all(np.isfinite(v) for v in finite.values())
