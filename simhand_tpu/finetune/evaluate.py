"""Eval-only CLI: run a trained detnet over any registry dataset.

Covers the reference's eval workflows (minimal-hand/README.md:19-27 plus
the STB/RHD/DO/EO protocol of utils/align.py + zimeval):

  python -m simhand_tpu.finetune.evaluate \
      --dataset stb --data_dir /data/STB --split test \
      --checkpoint /tmp/detnet/checkpoints [--backbone 50]

3D sets (freihand/dexycb/ah/stb/rhd/...): the predicted root-relative
bone-normalized joints are globally aligned to gt (root 0, ref bone 0-9 —
utils/align.py:12-25), then metric EPE (mm) + PCK AUC over 20..50mm, and
the normalized-frame EPE/AUC like train-time eval.

2D / tip-only sets (cmu/hand143/ganerated/ego4d/do/eo): heatmap-argmax
2D PCK in input-space pixels over the valid joints (tip slots only for
do/eo).
"""
from __future__ import annotations

import argparse
import json
import logging

import numpy as np

logger = logging.getLogger("simhand_tpu.finetune.evaluate")

TIP_ONLY = ("do", "eo", "dexter_object", "egodexter")
SETS_2D = ("cmu", "hand_labels", "hand143", "panoptic", "ganerated", "gan",
           "ego4d", "ego4d_hands") + TIP_ONLY


def evaluate_dataset(model, state, dataset, key: str, batch_size: int = 64,
                     max_batches: int | None = None,
                     dump_pre_joints: str | None = None) -> dict:
    import jax

    from simhand_tpu.finetune.datasets import (
        DetnetSampleBuilder,
        detnet_batch_iterator,
    )
    from simhand_tpu.finetune.evaluation import EvalUtil, global_align

    builder = DetnetSampleBuilder(train=False)
    apply = jax.jit(
        lambda params, stats, img: model.apply(
            {"params": params, "batch_stats": stats}, img, train=False
        )
    )

    key = key.lower()
    is_2d = key in SETS_2D
    metric_eval = EvalUtil()       # aligned metric EPE (m)
    norm_eval = EvalUtil()         # normalized-frame EPE
    px_eval = EvalUtil()           # 2D pixel PCK
    tip3d_eval = EvalUtil(num_kp=1)  # DO/EO masked 3D-tip protocol
    pre_joints = [] if dump_pre_joints else None
    n_batches = 0
    for batch in detnet_batch_iterator(dataset, builder, batch_size,
                                       shuffle=False, drop_remainder=False):
        preds = apply(state.params, state.batch_stats, batch["img"])
        if pre_joints is not None:
            pre_joints.append(np.asarray(preds["xyz"], np.float32))
        if is_2d or "joint" not in batch:
            # heatmap argmax -> input-space 2D keypoints
            uv = np.asarray(preds["uv"], np.float64)        # (N,21,2) rc @32
            uv = uv[..., ::-1] * (builder.inp_res / builder.hm_res)  # -> xy
            gt = np.asarray(batch["kp2d"], np.float64)
            vis = np.asarray(batch["hm_veil"], bool)
            if key in TIP_ONLY:
                from simhand_tpu.finetune.benchmarks import FINGERTIP_IDS

                mask = np.zeros_like(vis)
                mask[:, FINGERTIP_IDS] = vis[:, FINGERTIP_IDS]
                # raw-annotation validity from the builder: zero-filled
                # rows are no longer zero after the affine transform
                vis = mask & np.asarray(batch["kp2d_valid"], bool)
            px_eval.feed(gt, uv, vis)
            if "tips_3d" in batch:
                # the reference's headline DO/EO metric: masked
                # centroid/scale alignment of predicted tips onto the
                # valid 3D gt tips, then metric EPE (align.py:27-57)
                gt3, p3, counts = global_align(
                    np.asarray(batch["tips_3d"], np.float64),
                    np.asarray(preds["xyz"], np.float64), "do",
                )
                if len(gt3):
                    tip3d_eval.feed(gt3.reshape(-1, 1, 3),
                                    p3.reshape(-1, 1, 3))
        else:
            xyz = np.asarray(preds["xyz"], np.float64)      # normalized
            gt = np.asarray(batch["joint"], np.float64)
            root = batch["joint_root"][:, None]
            bone = batch["joint_bone"].reshape(-1, 1, 1)
            norm_eval.feed((gt - root) / bone, xyz)
            # de-normalize through the reference global alignment
            gt_a, pred_a = global_align(gt, xyz, "fh")
            metric_eval.feed(gt_a, pred_a)
        n_batches += 1
        if max_batches and n_batches >= max_batches:
            break

    if pre_joints is not None:
        # the reference's out_testset/<data>_pre_joints.npy artifact —
        # feeds optimize_shape --pre_joints (dl_shape_estimate) and
        # recon_epe (aik_pose): (N, 21, 3) freihand-order normalized
        # predictions
        np.save(dump_pre_joints, np.concatenate(pre_joints))
        logger.info("dumped predictions: %s", dump_pre_joints)

    out: dict = {"dataset": key, "batches": n_batches}
    if is_2d:
        # PCK curve over pixel thresholds; report PCK@{8,16}px + mean EPE
        epe_mean, _, epe_median, _, curve, th = px_eval.get_measures(
            0.0, 32.0, 33
        )
        out.update({
            "epe_px_mean": epe_mean,
            "epe_px_median": epe_median,
            "pck@8px": float(curve[np.searchsorted(th, 8.0)]),
            "pck@16px": float(curve[np.searchsorted(th, 16.0)]),
        })
        if tip3d_eval._dists:
            epe_mean, _, epe_median, auc, _, _ = tip3d_eval.get_measures(
                0.020, 0.050, 20
            )
            out.update({
                "epe_mm_mean": epe_mean * 1000.0,
                "epe_mm_median": epe_median * 1000.0,
                "auc_20_50mm": auc,
            })
    else:
        epe_mean, _, epe_median, auc, _, _ = metric_eval.get_measures(
            0.020, 0.050, 20
        )
        out.update({
            "epe_mm_mean": epe_mean * 1000.0,
            "epe_mm_median": epe_median * 1000.0,
            "auc_20_50mm": auc,
        })
        epe_mean, _, epe_median, auc, _, _ = norm_eval.get_measures(
            0.0, 0.05, 20
        )
        out.update({
            "epe_norm_mean": epe_mean,
            "epe_norm_median": epe_median,
            "auc_norm": auc,
        })
    return out


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--dataset", required=True,
                   help="one registry key (finetune/registry.py)")
    p.add_argument("--data_dir", default=None)
    p.add_argument("--split", default="test")
    p.add_argument("--setup", default="s1", choices=["s1", "s2"])
    p.add_argument("--backbone", default="50",
                   choices=["18", "50", "152"])  # 18: smoke/tests
    p.add_argument("--checkpoint", default=None,
                   help="orbax checkpoint dir written by finetune.train")
    p.add_argument("--pretrain", default=None,
                   help=".pth detnet (torch interop) instead of --checkpoint")
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--max_batches", type=int, default=None)
    p.add_argument("--out_json", default=None)
    p.add_argument("--dump_pre_joints", default=None,
                   help="save predicted (N,21,3) joints npy — the "
                        "reference's out_testset/<data>_pre_joints.npy, "
                        "consumed by optimize_shape --pre_joints and "
                        "finetune.recon")
    args = p.parse_args(argv)

    logging.basicConfig(level=logging.INFO)

    import jax
    import jax.numpy as jnp

    from simhand_tpu.finetune.detnet import DetNet
    from simhand_tpu.finetune.registry import build_composed_dataset
    from simhand_tpu.train.state import TrainState

    model = DetNet(resnet_size=args.backbone, dtype=jnp.bfloat16)
    variables = model.init(jax.random.key(0), jnp.zeros((1, 128, 128, 3)))
    params, batch_stats = variables["params"], variables["batch_stats"]

    if args.pretrain:
        import torch

        from simhand_tpu.finetune.torch_port_detnet import (
            torch_state_dict_to_detnet,
        )

        sd = torch.load(args.pretrain, map_location="cpu",
                        weights_only=True)
        params, batch_stats = torch_state_dict_to_detnet(sd)
        logger.info("loaded torch detnet from %s", args.pretrain)

    import optax

    state = TrainState.create(
        apply_fn=model.apply, params=params,
        tx=optax.identity(), batch_stats=batch_stats,
    )
    if args.checkpoint:
        from simhand_tpu.train.checkpoint import CheckpointManager

        manager = CheckpointManager(args.checkpoint, metric="det_total")
        raw = manager.restore_tree()
        manager.close()
        if raw is None:
            raise FileNotFoundError(
                f"no checkpoint steps under {args.checkpoint}"
            )
        state = state.replace(params=raw["params"],
                              batch_stats=raw["batch_stats"])
        logger.info("restored checkpoint from %s", args.checkpoint)

    dataset = build_composed_dataset(
        args.dataset, args.data_dir, args.split, setup=args.setup,
        synthetic_n=max(args.batch_size, 64),
    )
    metrics = evaluate_dataset(model, state, dataset, args.dataset,
                               args.batch_size, args.max_batches,
                               dump_pre_joints=args.dump_pre_joints)
    print(json.dumps(metrics))
    if args.out_json:
        with open(args.out_json, "w") as f:
            json.dump(metrics, f)
    return metrics


if __name__ == "__main__":
    main()
