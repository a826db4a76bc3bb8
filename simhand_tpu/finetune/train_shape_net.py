"""ShapeNet trainer: bone lengths -> MANO beta regression.

Reference: minimal-hand/train_shape_net.py (plain PyTorch loop, StepLR) +
create_data.py (beta ~ 3*N(0,1) synthetic pairs). TPU-native: data is
generated on the fly through the differentiable MANO bone model, the
whole step jits.

  python -m simhand_tpu.finetune.train_shape_net \
      --mano mano/models/MANO_RIGHT.pkl --steps 2000
"""
from __future__ import annotations

import argparse
import logging

import numpy as np

logger = logging.getLogger("simhand_tpu.shapenet")


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--mano", required=True, help="MANO_RIGHT.pkl path")
    p.add_argument("--steps", type=int, default=5000)
    p.add_argument("--batch_size", type=int, default=512)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--lr_decay_step", type=int, default=2000)
    p.add_argument("--lr_decay_gamma", type=float, default=0.3)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", default=None, help="msgpack params output path")
    p.add_argument(
        "--data_root", default=None,
        help="SIK1M npy directory (data_bone/data_shape.npy). Default: "
        "generate (beta, bone) pairs on the fly through the MANO model "
        "each step — same distribution, no dataset files needed.",
    )
    args = p.parse_args(argv)

    logging.basicConfig(level=logging.INFO)

    import jax
    import jax.numpy as jnp
    import optax

    from simhand_tpu.finetune.mano import ManoModel, relative_bone_lengths
    from simhand_tpu.finetune.shape_net import ShapeNet, sik_loss

    mano = ManoModel(args.mano)
    model = ShapeNet()
    params = model.init(jax.random.key(args.seed), jnp.zeros((1, 15)))["params"]

    schedule = optax.exponential_decay(
        args.lr, args.lr_decay_step, args.lr_decay_gamma, staircase=True
    )
    tx = optax.adam(schedule)
    opt_state = tx.init(params)

    sik1m = None
    if args.data_root is not None:
        from simhand_tpu.finetune.datasets import SIK1M

        sik1m = SIK1M(args.data_root, "train", seed=args.seed)
        logger.info("SIK1M: %d training pairs from %s", len(sik1m),
                    args.data_root)

    def loss_and_grads(params, bones):
        def loss_fn(p):
            beta = model.apply({"params": p}, bones)
            loss, _ = sik_loss(mano, beta, bones)
            return loss

        return jax.value_and_grad(loss_fn)(params)

    @jax.jit
    def step(params, opt_state, key):
        beta_gt = 3.0 * jax.random.normal(key, (args.batch_size, 10))
        bones = relative_bone_lengths(mano, beta_gt)
        loss, grads = loss_and_grads(params, bones)
        updates, opt_state2 = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state2, loss

    @jax.jit
    def step_data(params, opt_state, bones):
        loss, grads = loss_and_grads(params, bones)
        updates, opt_state2 = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state2, loss

    key = jax.random.key(args.seed + 1)
    rng = np.random.default_rng(args.seed + 1)
    for i in range(args.steps):
        if sik1m is not None:
            idx = rng.integers(0, len(sik1m), args.batch_size)
            bones = np.stack([sik1m[j]["rel_bone_len"] for j in idx]).astype(
                np.float32
            )
            params, opt_state, loss = step_data(params, opt_state, bones)
        else:
            key, sub = jax.random.split(key)
            params, opt_state, loss = step(params, opt_state, sub)
        if i % 200 == 0:
            logger.info("step %d sik_loss %.5f", i, float(loss))

    if args.out:
        from flax import serialization

        with open(args.out, "wb") as f:
            f.write(serialization.to_bytes(params))
        logger.info("saved ShapeNet params to %s", args.out)
    return params


if __name__ == "__main__":
    main()
