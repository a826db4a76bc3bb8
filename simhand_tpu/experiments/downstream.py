"""Downstream evaluation entry: pretrained encoder -> 2.5D head -> EPE/AUC.

Reference: src/experiments/utils.py:532-601 ``downstream_evaluation`` —
loads a pre-trained encoder, attaches the 2.5D regression head, and
evaluates on a supervised dataset via evaluate().

  python -m simhand_tpu.experiments.downstream \
      --encoder resnet50_simhand.pth --data_dir /data/freihand
"""
from __future__ import annotations

import argparse
import logging

import numpy as np

logger = logging.getLogger("simhand_tpu.downstream")


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--encoder", default=None, help="torch .pth encoder init")
    p.add_argument("--resnet_size", default="50")
    p.add_argument("--data_dir", required=True, help="FreiHAND root")
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--max_batches", type=int, default=None)
    # Accepted-and-ignored reference flags (src/experiments/utils.py:
    # 246-260 `-contrastive`/`-pairwise`, 521-526 `-num_of_checkpoints`).
    # The downstream parser there accepts them but the evaluation path
    # never reads them; kept so reference invocations parse unchanged,
    # like the `-gpus`/`-flip` flags on the pretrain CLI.
    p.add_argument(
        "-contrastive", action="append", default=[],
        choices=["rotate", "crop", "color_jitter"],
        help="(reference-compat, ignored) contrastive augmentations",
    )
    p.add_argument(
        "-pairwise", action="append", default=[],
        choices=["rotate", "crop", "color_jitter"],
        help="(reference-compat, ignored) pairwise augmentations",
    )
    p.add_argument(
        "-num_of_checkpoints", type=int, default=-1,
        help="(reference-compat, ignored) checkpoints to fine-tune",
    )
    args = p.parse_args(argv)
    if args.contrastive or args.pairwise or args.num_of_checkpoints != -1:
        logger.warning(
            "-contrastive/-pairwise/-num_of_checkpoints are accepted for "
            "reference CLI compatibility but ignored (the reference's "
            "downstream_evaluation never reads them)"
        )

    logging.basicConfig(level=logging.INFO)

    import jax
    import jax.numpy as jnp

    from simhand_tpu.data.augment_cv2 import AugmentFlags, AugmentParams
    from simhand_tpu.data.pipeline import PretrainDataset, batch_iterator
    from simhand_tpu.data.sources.freihand import FreihandPretrainSource
    from simhand_tpu.experiments.evaluation import evaluate_25d
    from simhand_tpu.models.heads import RN25DWithMLPRef

    source = FreihandPretrainSource(args.data_dir, split="val")
    dataset = PretrainDataset(
        source, "supervised",
        AugmentFlags(crop=True, resize=True), AugmentParams(),
    )

    model = RN25DWithMLPRef(resnet_size=args.resnet_size)
    variables = model.init(jax.random.key(0), jnp.zeros((1, 128, 128, 3)))
    if args.encoder:
        from simhand_tpu.hub import load_resnet50_simhand

        enc_params, enc_stats = load_resnet50_simhand(args.encoder)
        variables = {
            "params": {**variables["params"], "encoder": enc_params},
            "batch_stats": {**variables["batch_stats"], "encoder": enc_stats},
        }
        logger.info("loaded encoder from %s", args.encoder)

    predict = jax.jit(
        lambda img: model.apply(variables, img, train=False)["kp25d"]
    )

    batches = []
    for i, b in enumerate(
        batch_iterator(dataset, args.batch_size, shuffle=False)
    ):
        batches.append(b)
        if args.max_batches and i + 1 >= args.max_batches:
            break
    metrics = evaluate_25d(lambda img: np.asarray(predict(jnp.asarray(img))),
                           batches)
    for k, v in metrics.items():
        logger.info("%s: %.5f", k, v)
    return metrics


if __name__ == "__main__":
    main()
