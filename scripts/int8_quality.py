"""W8A8 quantization quality on a TRAINED detnet — the accuracy side of
the 1.2x int8 serving speedup (scripts/bench_int8_e2e.py).

tests/test_int8_infer.py validates the quantized forward against
random-init weights (cosine / map deltas); this script answers the
deployment question: after actually fine-tuning detnet on
`synthetic-hand` (the CPU-deterministic miniature from
scripts/transfer_check.py), how much task metric does `--quantize
int8_compute` give up vs the f32 fold it replaces?

Three arms, identical held-out split (synthetic-hand n=64 seed=1),
identical meters (finetune/train.py:evaluate_detnet_forward — the
reference's evalutils measures):

  flax      — the trained model's plain apply (train=False)
  fold_f32  — serving/int8_infer.py:fold_detnet_f32 (BN folded, f32)
  int8      — build_detnet_int8, activation scales calibrated on the
              TRAIN images through the deterministic val-style builder

Prints one JSON line with per-arm {hm_pck, epe_mean, auc} and the
int8-vs-f32 deltas.

Usage:
    PYTHONPATH= JAX_PLATFORMS=cpu python scripts/int8_quality.py \
        [--train_steps 150] [--backbone 18] [--workdir DIR]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _pin_cpu():
    """Deterministic CPU fixture (see transfer_check.py:_pin_cpu — the
    axon sitecustomize would otherwise route to the TPU)."""
    import jax

    try:
        if jax.config.jax_platforms != "cpu":
            jax.config.update("jax_platforms", "cpu")
    except RuntimeError:
        pass  # backend already initialized (pytest harness: cpu)
    # If a backend was already up and it is NOT cpu (e.g. the axon-tunnel
    # TPU initialized by an earlier import), refuse to continue: the
    # "deterministic CPU fixture" would silently fine-tune on TPU, paying
    # multi-minute remote compiles and losing determinism.
    backend = jax.default_backend()
    if backend != "cpu":
        raise RuntimeError(
            f"int8_quality needs the CPU backend but jax already "
            f"initialized {backend!r}; run in a fresh process with "
            f"PYTHONPATH= JAX_PLATFORMS=cpu"
        )


def run_int8_quality(
    workdir: str,
    train_steps: int = 150,
    batch_size: int = 16,
    backbone: str = "18",
    lr: float = 3e-4,
) -> dict:
    import jax
    import numpy as np

    _pin_cpu()
    from simhand_tpu.finetune.train import main as ft_main

    # --- 1. fine-tune on synthetic-hand (same recipe as transfer_check) --
    out_dir = os.path.join(workdir, "ft")
    n_train = max(batch_size * 2, 64)
    steps_per_epoch = max(n_train // batch_size, 1)
    epochs = -(-train_steps // steps_per_epoch)
    ft_main([
        "--dataset", "synthetic-hand", "--backbone", backbone,
        "--epochs", str(epochs), "--batch_size", str(batch_size),
        "--max_steps", str(train_steps),
        "--eval_every", str(epochs), "--lr", str(lr),
        "--out_dir", out_dir,
    ])

    # --- 2. reload through the deployment artifact (detnet.pth) ---------
    # Serving quantizes the SHIPPED weights, so the quality check must
    # go through the same torch-port round trip the export CLI uses
    # (serving/export.py:_load_variables).
    import torch

    from simhand_tpu.finetune.torch_port_detnet import (
        torch_state_dict_to_detnet,
    )

    sd = torch.load(os.path.join(out_dir, "detnet.pth"),
                    map_location="cpu", weights_only=True)
    params, stats = torch_state_dict_to_detnet(
        {k: v.numpy() for k, v in sd.items()}
    )
    variables = {"params": params, "batch_stats": stats}

    # --- 3. build the three forwards ------------------------------------
    import jax.numpy as jnp

    from simhand_tpu.finetune.datasets import (
        DetnetSampleBuilder,
        detnet_batch_iterator,
    )
    from simhand_tpu.finetune.detnet import DetNet
    from simhand_tpu.finetune.registry import build_composed_dataset
    from simhand_tpu.finetune.train import evaluate_detnet_forward
    from simhand_tpu.serving.int8_infer import (
        build_detnet_int8,
        fold_detnet_f32,
    )

    model = DetNet(resnet_size=backbone, dtype=jnp.float32)
    apply = jax.jit(
        lambda img: model.apply(variables, img, train=False)
    )
    fold = jax.jit(fold_detnet_f32(variables, backbone))

    # calibration: TRAIN images (seed-0 draw, disjoint from the seed-1
    # val split) through the deterministic val-style builder — the same
    # preprocessing the serving input path applies
    train_ds = build_composed_dataset(
        "synthetic-hand", None, "train", synthetic_n=n_train)
    calib_builder = DetnetSampleBuilder(train=False)
    calib = [
        jnp.asarray(b["img"])
        for _, b in zip(range(2), detnet_batch_iterator(
            train_ds, calib_builder, batch_size, shuffle=False,
            drop_remainder=True))
    ]
    qforward, report = build_detnet_int8(variables, backbone,
                                         calib_batches=calib)
    qjit = jax.jit(qforward)

    # --- 4. identical meters on the held-out split ----------------------
    val_ds = build_composed_dataset(
        "synthetic-hand", None, "val", synthetic_n=64)
    val_builder = DetnetSampleBuilder(train=False)

    arms = {"flax": apply, "fold_f32": fold, "int8": qjit}
    result = {
        name: evaluate_detnet_forward(fn, val_ds, val_builder, batch_size)
        for name, fn in arms.items()
    }
    result["int8_sites"] = report["sites"]
    f32, q = result["fold_f32"], result["int8"]
    # only emit deltas for meters present in BOTH arms; a missing meter
    # (e.g. no 3D joints in the eval set) becomes JSON null, never NaN —
    # the output stays strict-JSON parseable.
    result["delta_int8_vs_f32"] = {
        k: (q[k] - f32[k]) if (k in q and k in f32) else None
        for k in ("hm_pck", "hm_pck_loose", "hm_dist", "epe_mean", "auc")
    }
    return result


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--train_steps", type=int, default=150)
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--backbone", default="18")
    p.add_argument("--lr", type=float, default=3e-4)
    p.add_argument("--workdir", default=None)
    args = p.parse_args(argv)

    import logging

    logging.basicConfig(level=logging.INFO)
    workdir = args.workdir or tempfile.mkdtemp(prefix="int8_quality_")
    os.environ.setdefault("BASE_PATH", os.path.join(workdir, "runs"))
    result = run_int8_quality(
        workdir, args.train_steps, args.batch_size, args.backbone, args.lr,
    )
    print(json.dumps(result))
    return result


if __name__ == "__main__":
    main()
