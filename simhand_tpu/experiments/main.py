"""Pre-training entry point.

Reference-compatible CLI (src/experiments/main.py), TPU-native execution:

  python -m simhand_tpu.experiments.main \
      --experiment_type simhand_w --weight_type linear --diff_type mpjpe \
      --pos_neg pos_neg --joints_type original \
      --crop --resize --rotate --color_jitter \
      -sources ego4d -sources 100doh --datasets_scale 2m \
      -batch_size 8192 -epochs 100 -resnet_size 50

The global batch is sharded over all attached TPU chips (1-D "data" ICI
mesh); the contrastive loss sees the full 8192-sample negative set via
all-gathered projections (unlike the reference's per-GPU "dp" shards).
"""
from __future__ import annotations

import logging
import os
import time

import numpy as np

logger = logging.getLogger("simhand_tpu")


def build_sources(args, train_param):
    """Instantiate sample sources from -sources flags."""
    from simhand_tpu import constants
    from simhand_tpu.data.sources import Hand100MSource

    root = args.data_dir or constants.HAND2M_DATA
    scale = args.datasets_scale or "1m"
    sources = args.sources or ["ego4d"]
    # --cache_size: train-resolution crops. Joints are stored normalized
    # and pixel-scaled at load (hand100m.py), so any size is "the
    # reference loader at that resolution" — the 224 default is the
    # reference's RES; 160 cuts host+H2D bytes ~2x for the 128-px model.
    src_kwargs = {}
    if getattr(args, "cache_size", None):
        src_kwargs["crop_size"] = int(args.cache_size)
    out = []
    for s in sources:
        if s in ("ego4d", "100doh"):
            out.append(Hand100MSource(root, source=s, scale=scale, **src_kwargs))
        elif s == "synthetic":
            from simhand_tpu.data.sources import generate_synthetic_hand100m

            synth_root = os.path.join(root, "synthetic")
            anno = os.path.join(
                synth_root, "annotations", "100DOH", "Hand100M_100DOH_smoke_v1-1.json"
            )
            if not os.path.exists(anno):
                generate_synthetic_hand100m(synth_root, num_images=256, num_videos=16)
            out.append(Hand100MSource(synth_root, source="100doh",
                                      scale="smoke", **src_kwargs))
        else:
            raise NotImplementedError(
                f"source {s!r} is a fine-tune-side dataset; use simhand_tpu.finetune"
            )
    if len(out) == 1:
        return out[0]
    from simhand_tpu.data.concat import ConcatSource

    return ConcatSource(out)


def main(argv=None):
    from simhand_tpu.experiments.cli import get_general_args
    from simhand_tpu.experiments import config as cfg_mod

    args = get_general_args()
    if getattr(args, "heatmap", False):
        # faithful to the reference: get_model raises for every
        # experiment type when heatmap_flag is set
        # (/root/reference/src/experiments/utils.py:633-665)
        raise NotImplementedError(
            "--heatmap is not implemented for any experiment type "
            "(matches the reference)"
        )

    logging.basicConfig(
        level=logging.DEBUG if args.debug else logging.INFO,
        format="%(asctime)s %(name)s %(levelname)s %(message)s",
    )

    train_param = cfg_mod.read_json(cfg_mod.TRAINING_CONFIG_PATH)
    train_param = cfg_mod.update_train_params(args, train_param)

    seed = int(train_param["seed"])
    np.random.seed(seed)

    import jax
    import jax.numpy as jnp

    from simhand_tpu.data.augment_cv2 import AugmentFlags, AugmentParams
    from simhand_tpu.data.pipeline import PretrainDataset, batch_iterator
    from simhand_tpu.models import ContrastiveModel
    from simhand_tpu.models.contrastive import ContrastiveConfig
    from simhand_tpu.parallel import create_mesh
    from simhand_tpu.parallel.mesh import replicate, shard_batch
    from simhand_tpu.train import (
        OptimizerConfig,
        create_train_state,
        make_train_step,
    )
    from simhand_tpu.train.checkpoint import CheckpointManager, export_torch_encoder
    from simhand_tpu import constants

    # ---------------- data ----------------
    source = build_sources(args, train_param)
    if args.cache_dir:
        from simhand_tpu.data.cache import CachedHand100MSource, build_crop_cache

        if not os.path.exists(os.path.join(args.cache_dir, "index.json")):
            logger.info("building packed crop cache at %s", args.cache_dir)
            build_crop_cache(source, args.cache_dir, progress=True)
        source = CachedHand100MSource(args.cache_dir)
        if args.cache_size and source.crop_size != int(args.cache_size):
            raise ValueError(
                f"--cache_size {args.cache_size} does not match the existing "
                f"cache at {args.cache_dir} (stores {source.crop_size}² "
                f"crops); rebuild into a fresh --cache_dir"
            )
    num_samples = len(source)
    logger.info("dataset: %d samples", num_samples)

    flags = AugmentFlags(
        **{k: bool(v) for k, v in train_param["augmentation_flags"].items()}
    )
    ap = train_param["augmentation_params"]
    params = AugmentParams(
        crop_margin=ap["crop_margin"],
        crop_margin_range=tuple(ap["crop_margin_range"]),
        cut_out_fraction=tuple(ap["cut_out_fraction"]),
        hue_factor_range=tuple(ap["hue_factor_range"]),
        min_angle=min(ap["min_angle"], ap["max_angle"]),
        max_angle=max(ap["min_angle"], ap["max_angle"]),
        resize_shape=tuple(ap["resize_shape"]),
        sat_factor_range=tuple(ap["sat_factor_range"]),
        value_factor_alpha_range=tuple(ap["value_factor_alpha_range"]),
        value_factor_beta_range=tuple(ap["value_factor_beta_range"]),
        crop_box_jitter=tuple(ap["crop_box_jitter"]),
        sobel_kernel=int(ap["sobel_kernel"]),
        noise_std=float(ap["noise_std"]),
    )
    experiment_type = args.experiment_type or "simclr"
    # README-documented aliases the reference's get_model never handled
    # (SURVEY §2.11): handclr(_w) == simhand(_w).
    experiment_type = {
        "handclr": "simhand", "handclr_w": "simhand_w",
        "simhand-v0": "simhand",
    }.get(experiment_type, experiment_type)
    dataset = PretrainDataset(source, experiment_type, flags, params, seed=seed,
                              use_palm=getattr(args, 'use_palm', False))

    # ---------------- model ----------------
    model_param = cfg_mod.read_json(cfg_mod.model_config_path(experiment_type))
    model_param = cfg_mod.update_model_params(
        model_param, args, num_samples, train_param
    )

    batch_size = int(train_param["batch_size"])
    accum = int(train_param.get("accumulate_grad_batches", 1))
    iters_per_epoch = max(num_samples // batch_size, 1)
    epochs = int(train_param["epochs"])

    bn_variant = getattr(args, "bn_variant", "exact")
    model = ContrastiveModel(
        resnet_size=str(model_param["resnet_size"]),
        proj_hidden_dim=int(model_param["projection_head_hidden_dim"]),
        proj_output_dim=int(model_param["output_dim"]),
        dtype=jnp.bfloat16 if str(train_param.get("precision")) in ("16", "bf16") else jnp.float32,
        bn_stop_gradient_stats=bn_variant == "stop_grad",
        bn_fused="pallas" if bn_variant == "fused_pallas"
        else bn_variant == "fused",
    )
    opt_cfg = OptimizerConfig(
        lr=float(model_param["lr"]),
        weight_decay=float(model_param["opt_weight_decay"]),
        optimizer=str(model_param["optimizer"]),
        warmup_epochs=int(model_param["warmup_epochs"]),
        epochs=int(model_param.get("lr_max_epochs") or epochs),
        accumulate_grad_batches=accum,
        train_iters_per_epoch=iters_per_epoch,
    )
    side = int(params.resize_shape[0])
    rng = jax.random.key(seed)
    state = create_train_state(model, opt_cfg, rng, input_shape=(2, side, side, 3))
    logger.info(
        "model rn%s, base lr %.3e, %d iters/epoch",
        model_param["resnet_size"], opt_cfg.base_lr, iters_per_epoch,
    )

    ccfg = ContrastiveConfig(
        experiment_type=experiment_type,
        augmentation=tuple(model_param["augmentation"]),
        image_side=float(side),
        weight_type=str(model_param.get("weight_type", "linear")),
        diff_type=str(model_param.get("diff_type", "mpjpe")),
        pos_neg=str(model_param.get("pos_neg", "pos_neg")),
        joints_type=str(model_param.get("joints_type", "aug")),
        use_pca=bool(model_param.get("use_pca", False)),
        non_linear_lambda_pos=float(model_param.get("non_linear_lambda_pos", 5.0)),
        non_linear_lambda_neg=float(model_param.get("non_linear_lambda_neg", 0.05)),
        use_pallas=bool(args.use_pallas),
    )

    mesh = create_mesh() if len(jax.devices()) > 1 else None
    augment = (flags, params, side) if args.device_augment else None
    use_fsdp = bool(getattr(args, "fsdp", False)) and mesh is not None
    if use_fsdp:
        # ZeRO-3 layout: params + optimizer state sharded over the data
        # axis, all-gathers/reduce-scatters inserted by GSPMD. Semantics:
        # sync-BN + global-batch loss (== a single-device step on the
        # global batch; tests/test_fsdp.py).
        from simhand_tpu.parallel.fsdp import make_fsdp_train_step

        step_fn, place_state, _ = make_fsdp_train_step(
            model, ccfg, mesh, state, augment=augment
        )
    else:
        step_fn = make_train_step(model, ccfg, mesh=mesh, augment=augment)
    from simhand_tpu.train import make_eval_step

    # eval consumes raw batches + deterministic on-device augmentation
    # when the production fast path is active, so validation never goes
    # blind under --device_augment (train/loop.py:make_eval_step).
    eval_fn = make_eval_step(model, ccfg, mesh=mesh, augment=augment)
    if mesh is not None:
        state = place_state(state) if use_fsdp else replicate(mesh, state)

    # held-out validation slice (reference: re-split val loaders,
    # data_loader/utils.py:219-269). Hand100M has no labeled val set, so
    # the tail (1 - train_ratio) of the index space serves as one.
    train_ratio = float(train_param.get("train_ratio", 1.0))
    n_val = int(num_samples * (1.0 - train_ratio))
    n_val = (n_val // batch_size) * batch_size

    # ---------------- observability ----------------
    from simhand_tpu.utils.logging import (
        MetricLogger,
        register_experiment,
        setup_debug_logging,
    )

    exp_name = args.experiment_name or cfg_mod.prepare_name(
        f"{experiment_type}_", train_param
    )
    metric_logger = MetricLogger(
        exp_name, tb_dir=constants.TENSORBOARD_LOGS, tags=list(args.tag)
    )
    if args.meta_file:
        register_experiment(args.meta_file, exp_name, args.experiment_key)
    if args.debug:
        setup_debug_logging(
            os.path.join(constants.SAVED_META_INFO_PATH, "debug"), exp_name
        )

    # ---------------- checkpointing ----------------
    ckpt_dir = args.resume_path or os.path.join(
        constants.SAVED_MODELS_BASE_PATH, exp_name, "checkpoints"
    )
    manager = CheckpointManager(ckpt_dir, save_top_k=int(args.save_top_k))
    if args.checkpoint:
        # reference restore_model: restore a NAMED checkpoint; here the
        # name is the orbax step number (digits anywhere in the name)
        import re as _re

        m = _re.search(r"\d+", args.checkpoint)
        if m is None:
            raise ValueError(
                f"-checkpoint {args.checkpoint!r}: no step number in the "
                f"name (available steps: {manager.all_steps()})"
            )
        step_req = int(m.group())
        available = manager.all_steps()
        if step_req not in available:
            raise FileNotFoundError(
                f"-checkpoint {args.checkpoint!r}: step {step_req} not "
                f"under {ckpt_dir} (available: {available})"
            )
        state = manager.restore(state, step=step_req)
        logger.info("restored checkpoint step %s", step_req)
    elif args.resume or args.resume_path:
        restored = manager.restore(state)
        if restored is not None:
            state = restored
            logger.info("resumed from step %s", manager.latest_step())

    if args.eval:
        # evaluation-only mode: load the checkpoint at --eval_path (or the
        # run's own dir) and report the contrastive loss on the data.
        eval_mgr = (
            CheckpointManager(args.eval_path) if args.eval_path else manager
        )
        restored = eval_mgr.restore(state)
        if restored is not None:
            state = restored
        losses = []
        for i, batch in enumerate(
            batch_iterator(dataset, batch_size, shuffle=False,
                           raw=args.device_augment,
                           num_threads=int(train_param.get("num_workers", 8)))
        ):
            if mesh is not None:
                batch = shard_batch(mesh, batch)
            losses.append(float(eval_fn(state, batch)["contrastive_loss"]))
            if i >= 50:
                break
        logger.info("eval contrastive_loss: %.5f", float(np.mean(losses)))
        metric_logger.close()
        manager.close()
        return state

    if args.profile_dir:
        jax.profiler.start_trace(args.profile_dir)

    # ---------------- train loop ----------------
    if args.device_augment:
        # one-sample view reconstruction for the sample-pair figure
        # (tiny B=1 program, compiled once per run, cached thereafter)
        from simhand_tpu.data.augment import prepare_views
        from simhand_tpu.train.loop import EVAL_AUGMENT_SEED

        pair_views_fn = jax.jit(
            lambda raw: prepare_views(
                raw, jax.random.key(EVAL_AUGMENT_SEED), flags, params, side
            )
        )
    global_step = 0
    max_steps = args.max_steps
    num_workers = int(train_param.get("num_workers", 8))
    stop = False

    # Preemption safety (the reference has no fault handling, SURVEY §5):
    # SIGTERM requests a checkpoint at the next step boundary, then exits.
    import signal

    preempted = {"flag": False}

    def _on_sigterm(signum, frame):
        logger.warning("SIGTERM received — checkpointing at next boundary")
        preempted["flag"] = True

    try:
        signal.signal(signal.SIGTERM, _on_sigterm)
    except ValueError:
        pass  # non-main thread (tests)
    for epoch in range(epochs):
        if stop:
            break
        epoch_losses = []
        t_epoch = time.time()
        weights = (
            source.sample_weights() if hasattr(source, "sample_weights") else None
        )
        from simhand_tpu.parallel.mesh import device_prefetch

        host_iter = batch_iterator(
            dataset, batch_size, seed=seed, epoch=epoch,
            num_threads=num_workers, raw=args.device_augment,
            sample_weights=weights,
        )
        prefetch_iter = device_prefetch(host_iter, mesh)
        for batch_idx, batch in enumerate(prefetch_iter):
            state, metrics = step_fn(state, batch)
            global_step += 1
            if batch_idx == 4 and epoch % 5 == 0:
                # sample-pair figure per few epochs (the reference's
                # UploadCometLogs pushes figures at batch_idx==4,
                # callbacks/upload_comet_logs.py:38-123). Under
                # --device_augment the batch is raw; reconstruct the
                # on-device views for one sample with the deterministic
                # eval key so the figure shows what the model sees.
                from simhand_tpu.utils.plots import plot_pair_images

                if args.device_augment:
                    views = pair_views_fn(
                        {k: v[:1] for k, v in batch.items()}
                    )
                else:
                    views = batch
                fig = plot_pair_images(
                    np.asarray(views["transformed_image1"])[0],
                    np.asarray(views["transformed_image2"])[0],
                    title=f"epoch {epoch}",
                )
                metric_logger.log_figure("sample_pair", fig, global_step)
            if args.log_interval == "step":
                # one device fetch for the whole metric dict (loss +
                # the equivariant family's projection stats)
                metric_logger.log_metrics(
                    {k: float(v) for k, v in jax.device_get(metrics).items()},
                    global_step,
                )
            else:
                epoch_losses.append(metrics["contrastive_loss"])
            if args.vis and args.vis_save_dir and global_step % 100 == 1:
                # simhand_vis contract: dump per-iteration npy of the pair
                # images (+ joints when present) for offline inspection
                # (reference: simhand_vis_model.py:53-64).
                os.makedirs(args.vis_save_dir, exist_ok=True)
                dump = {
                    k: np.asarray(v)
                    for k, v in batch.items()
                    if k.startswith(("transformed_image", "image", "joints"))
                }
                np.save(
                    os.path.join(args.vis_save_dir, f"iter_{global_step:07d}.npy"),
                    dump, allow_pickle=True,
                )
            if max_steps is not None and global_step >= max_steps:
                stop = True
                break
            if (getattr(args, "fault_inject_preempt_step", None) is not None
                    and global_step >= args.fault_inject_preempt_step):
                # deterministic preemption drill: same path as SIGTERM
                preempted["flag"] = True
            if preempted["flag"]:
                manager.save(
                    global_step, jax.device_get(state),
                    {"contrastive_loss": float(metrics["contrastive_loss"])},
                )
                manager.wait()
                logger.warning("checkpoint saved at step %d; exiting", global_step)
                stop = True
                break
        # close the loader NOW (runtime, not interpreter shutdown): an
        # abandoned generator would otherwise finalize with cv2 worker
        # threads mid-flight and abort the process at exit
        prefetch_iter.close()
        host_iter.close()
        if epoch_losses:
            mean_loss = float(np.mean([float(l) for l in epoch_losses]))
        else:
            mean_loss = float(metrics["contrastive_loss"])
        dt = time.time() - t_epoch
        logger.info(
            "epoch %d: contrastive_loss %.5f (%.1fs, %.1f img/s)",
            epoch, mean_loss, dt, batch_size * max(len(epoch_losses), 1) / dt,
        )
        metric_logger.log_metrics({"contrastive_loss_epoch": mean_loss}, global_step)
        if n_val > 0:
            val_losses = []
            val_order = np.arange(num_samples - n_val, num_samples)
            n_full = len(val_order) // batch_size
            if n_full:
                val_batches = [
                    val_order[b * batch_size : (b + 1) * batch_size]
                    for b in range(n_full)
                ]
            else:
                # fewer val samples than one batch: tile cyclically to
                # the compiled batch shape (one program, never NaN)
                val_batches = [np.resize(val_order, batch_size)]
            for idxs in val_batches:
                if args.device_augment:
                    # raw batches; deterministic augmentation happens
                    # on-device inside eval_fn (EVAL_AUGMENT_SEED)
                    val_batch = dataset.raw_batch(idxs)
                    if val_batch is None:
                        pairs = [dataset.raw_pair(int(i)) for i in idxs]
                        val_batch = {
                            k: np.stack([s[k] for s in pairs])
                            for k in pairs[0]
                        }
                else:
                    samples = [
                        dataset.__getitem__(int(i), epoch=0) for i in idxs
                    ]
                    val_batch = {
                        k: np.stack([s[k] for s in samples])
                        for k in samples[0]
                    }
                if mesh is not None:
                    val_batch = shard_batch(mesh, val_batch)
                val_losses.append(
                    float(eval_fn(state, val_batch)["contrastive_loss"])
                )
            metric_logger.log_metrics(
                {"contrastive_loss_val": float(np.mean(val_losses))}, global_step
            )
        if (epoch + 1) % max(int(args.save_period), 1) == 0 or epoch == epochs - 1:
            manager.save(global_step, jax.device_get(state),
                         {"contrastive_loss": mean_loss})

    manager.wait()
    if args.profile_dir:
        jax.profiler.stop_trace()

    if args.export_torch:
        export_torch_encoder(jax.device_get(state), args.export_torch)
        logger.info("exported torch encoder to %s", args.export_torch)
    metric_logger.close()
    manager.close()
    return state


if __name__ == "__main__":
    main()
