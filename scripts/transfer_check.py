"""Does pre-training transfer? The miniature of the reference's headline
claim (README.md:22 — SiMHand pre-training improves FreiHAND/DexYCB/AH
fine-tuning by 15/10/4%), runnable on CPU with synthetic data.

Both arms fine-tune detnet (rn18) on the `synthetic-hand` dataset (color
blobs at the keypoints over noise — the same visual statistic as the
synthetic pretrain corpus) with an identical budget; arm (b) first
pre-trains a simhand_w encoder on the synthetic Hand100M corpus and
initializes the backbone from the exported .pth.

Prints one JSON line: {"random": {...}, "pretrained": {...}} with the
fine-tune's final-epoch heatmap loss and the held-out hm_pck / EPE.

Usage:
    PYTHONPATH= JAX_PLATFORMS=cpu python scripts/transfer_check.py \
        --pretrain_steps 60 --finetune_steps 60 [--bn_variant stop_grad]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _pin_cpu():
    """The miniature is a CPU-deterministic fixture: its measured margins
    are platform-specific facts (the axon sitecustomize would otherwise
    route a bare invocation to the TPU, whose f32 conv numerics differ —
    observed: 0.658/0.673 TPU-era calibration vs 0.666/0.665 CPU at the
    same 40/40 budget). Pin before the backend initializes; the pytest
    harness (conftest) is already CPU."""
    import jax

    try:
        if jax.config.jax_platforms != "cpu":
            jax.config.update("jax_platforms", "cpu")
    except RuntimeError:
        pass  # backend already initialized (in-process harness: cpu)


def run_transfer_check(
    workdir: str,
    pretrain_steps: int = 60,
    finetune_steps: int = 60,
    batch_size: int = 16,
    bn_variant: str = "exact",
    lr: float = 3e-4,
    corpus_seed: int = 0,
    experiment_type: str = "simhand_w",
    skip_random: bool = False,
    resnet_size: str = "18",
) -> dict:
    """Runs both arms; returns {"random": metrics, "pretrained": metrics}.

    metrics: final-epoch mean heatmap loss (lossH), held-out hm_pck and
    epe (synthetic-hand val split, the seed-1 draw).
    """
    import numpy as np

    _pin_cpu()
    from simhand_tpu.finetune.train import main as ft_main

    os.environ.setdefault("BASE_PATH", os.path.join(workdir, "runs"))

    # epochs sized so the final epoch lands exactly on the step budget
    # (the trainer evals + checkpoints on the last epoch)
    n_train = max(batch_size * 2, 64)
    steps_per_epoch = max(n_train // batch_size, 1)
    ft_epochs = -(-finetune_steps // steps_per_epoch)

    def finetune(out_dir: str, pretrain: str | None) -> dict:
        args = [
            "--dataset", "synthetic-hand", "--backbone", resnet_size,
            "--epochs", str(ft_epochs), "--batch_size", str(batch_size),
            "--max_steps", str(finetune_steps),
            "--eval_every", str(ft_epochs),  # final-epoch eval only
            "--lr", str(lr),
            "--out_dir", out_dir,
        ]
        if pretrain:
            args += ["--pretrain", pretrain, "--lr_strategy", "DLR",
                     "--lr_head", str(lr)]
        ft_main(args)
        lossH = np.load(os.path.join(out_dir, "lossH.npy"))
        acc = np.load(os.path.join(out_dir, "acc_hm_all.npy"),
                      allow_pickle=True).item()
        auc = np.load(os.path.join(out_dir, "auc_all.npy"),
                      allow_pickle=True).item()
        key = next(iter(acc))
        out = {
            "lossH_final": float(lossH[-1, 1]),
            "hm_pck": float(acc[key][-1][1]),
            "auc": float(auc[key][-1][1]) if auc else float("nan"),
        }
        # non-degenerate heatmap signals (round-5: strict PCK and 3D AUC
        # read 0.0 at these budgets — hm_extras keeps two more columns
        # informative per cell)
        extras_path = os.path.join(out_dir, "hm_extras_all.npy")
        if os.path.exists(extras_path):
            extras = np.load(extras_path, allow_pickle=True).item()
            if extras:
                row = extras[next(iter(extras))][-1]
                out["hm_pck_loose"] = float(row[1])
                out["hm_dist"] = float(row[2])
        return out

    # --- arm (a): random init -------------------------------------------
    random_metrics = None
    if not skip_random:
        random_metrics = finetune(os.path.join(workdir, "ft_random"), None)

    # --- arm (b): brief simhand_w pretrain on the synthetic corpus ------
    from simhand_tpu.data.sources.synthetic import generate_synthetic_hand100m

    data_dir = os.path.join(workdir, "data")
    # generate at the path main.py's `-sources synthetic` reads
    # (<data_dir>/synthetic/...) — main skips generation when the
    # annotation exists, so corpus_seed takes effect; writing anywhere
    # else is silently ignored (round-3 bug: identical exports across
    # "different" corpora)
    generate_synthetic_hand100m(
        os.path.join(data_dir, "synthetic"), num_images=256, num_videos=16,
        seed=corpus_seed,
    )
    pth = os.path.join(workdir, "encoder_pretrained.pth")
    from simhand_tpu.experiments import main as pretrain_main

    argv = [
        "main.py", "--experiment_type", experiment_type, "--crop", "--resize",
        "--rotate", "-sources", "synthetic", "-batch_size",
        str(batch_size), "-resnet_size", resnet_size,
        "--data_dir", data_dir, "-experiment_name", "transfer_check",
        "-epochs", str(-(-pretrain_steps * batch_size // 128)),
        "--max_steps", str(pretrain_steps),
        "--export_torch", pth, "--bn_variant", bn_variant,
    ]
    old = sys.argv
    sys.argv = argv
    try:
        pretrain_main.main()
    finally:
        sys.argv = old

    pretrained_metrics = finetune(os.path.join(workdir, "ft_pretrained"), pth)
    return {"random": random_metrics, "pretrained": pretrained_metrics}


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--pretrain_steps", type=int, default=60)
    p.add_argument("--finetune_steps", type=int, default=60)
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--bn_variant", default="exact")
    p.add_argument("--lr", type=float, default=3e-4)
    p.add_argument("--corpus_seed", type=int, default=0,
                   help="pretrain-corpus RNG seed (robustness re-runs)")
    p.add_argument("--skip_random", action="store_true",
                   help="skip the random-init arm (comparisons between "
                        "pretraining objectives reuse the published "
                        "random-arm number)")
    p.add_argument("--experiment_type", default="simhand_w",
                   help="pretraining objective for arm (b) — compare "
                        "simclr (same-image positives) vs simhand_w "
                        "(mined similar-hand positives): the paper's "
                        "core-claim miniature")
    p.add_argument("--resnet_size", default="18")
    p.add_argument("--workdir", default=None)
    args = p.parse_args(argv)

    import logging

    logging.basicConfig(level=logging.INFO)
    workdir = args.workdir or tempfile.mkdtemp(prefix="transfer_check_")
    result = run_transfer_check(
        workdir, args.pretrain_steps, args.finetune_steps,
        args.batch_size, args.bn_variant, args.lr, args.corpus_seed,
        args.experiment_type, args.skip_random,
        resnet_size=args.resnet_size,
    )
    print(json.dumps(result))
    return result


if __name__ == "__main__":
    main()
