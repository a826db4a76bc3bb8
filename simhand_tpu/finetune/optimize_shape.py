"""Batch MANO shape-fitting driver: PSO vs LM vs ShapeNet comparison.

Reference: minimal-hand/optimize_shape.py + dl_shape_estimate.py — fits
betas to a set of relative-bone-length targets with each method and
reports the bone-length reconstruction error (align_bone_len).

  python -m simhand_tpu.finetune.optimize_shape \
      --mano mano/models/MANO_RIGHT.pkl --n 32 [--shapenet params.msgpack]
"""
from __future__ import annotations

import argparse

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--mano", required=True)
    p.add_argument("--n", type=int, default=32, help="number of synthetic targets")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--shapenet", default=None, help="trained ShapeNet params (msgpack)")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from simhand_tpu.finetune.lm_fit import align_bone_len, lm_fit_shape
    from simhand_tpu.finetune.mano import ManoModel, relative_bone_lengths
    from simhand_tpu.finetune.shape_net import (
        ShapeNet,
        pso_fit_shape,
        sample_shape_dataset,
    )

    mano = ManoModel(args.mano)
    targets, beta_gt = sample_shape_dataset(mano, args.n, seed=args.seed)

    def recon_err(betas):
        got = np.asarray(relative_bone_lengths(mano, jnp.asarray(betas)))
        return align_bone_len(got, targets)

    pso = np.stack([
        pso_fit_shape(mano, t, n_particles=80, n_iters=25, seed=i)
        for i, t in enumerate(targets)
    ])
    print(f"PSO   bone-length MAE: {recon_err(pso):.5f}")

    lm = np.stack([lm_fit_shape(mano, t)[0] for t in targets])
    print(f"LM    bone-length MAE: {recon_err(lm):.5f}")

    if args.shapenet:
        from flax import serialization

        model = ShapeNet()
        params = model.init(jax.random.key(0), jnp.zeros((1, 15)))["params"]
        with open(args.shapenet, "rb") as f:
            params = serialization.from_bytes(params, f.read())
        beta = np.asarray(model.apply({"params": params}, jnp.asarray(targets)))
        print(f"ShapeNet bone-length MAE: {recon_err(beta):.5f}")


if __name__ == "__main__":
    main()
