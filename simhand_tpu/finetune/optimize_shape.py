"""Batch MANO shape-fitting driver: PSO vs LM vs ShapeNet comparison.

Reference: minimal-hand/optimize_shape.py + dl_shape_estimate.py — fits
betas to a set of relative-bone-length targets with each method and
reports the bone-length reconstruction error (align_bone_len).

  python -m simhand_tpu.finetune.optimize_shape \
      --mano mano/models/MANO_RIGHT.pkl --n 32 [--shapenet params.msgpack]

The dl_shape_estimate workflow (minimal-hand/dl_shape_estimate.py:26-60)
regresses betas from PREDICTED joints instead of synthetic targets:

  python -m simhand_tpu.finetune.optimize_shape \
      --mano MANO_RIGHT.pkl --shapenet params.msgpack \
      --pre_joints out_testset/stb_pre_joints.npy --out_beta stb_dl.npy
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
    p.add_argument("--pre_joints", default=None,
                   help="npy of (N, 21, 3) predicted freihand-order joints: "
                        "run the dl_shape_estimate regression instead of "
                        "the synthetic comparison (requires --shapenet)")
    p.add_argument("--out_beta", default=None,
                   help="with --pre_joints: save the regressed (N, 10) "
                        "betas here (the reference's <data>_dl.npy)")
    args = p.parse_args(argv)

    if args.pre_joints:
        assert args.shapenet, "--pre_joints requires --shapenet"
        _dl_shape_estimate(args)
        return
    _synthetic_comparison(args)


def _dl_shape_estimate(args):
    """Predicted joints -> ShapeNet betas + bone-length regression error
    (reference: dl_shape_estimate.py:26-60 — load <data>_pre_joints.npy,
    cal_ref_bone, model(x)['beta'], save <data>_dl.npy, report err)."""
    import jax
    import jax.numpy as jnp
    from flax import serialization

    from simhand_tpu.finetune.lm_fit import (
        align_bone_len_ratio,
        ref_bones_from_joints,
    )
    from simhand_tpu.finetune.mano import ManoModel, relative_bone_lengths
    from simhand_tpu.finetune.shape_net import ShapeNet

    joints = np.load(args.pre_joints)
    assert joints.ndim == 3 and joints.shape[1:] == (21, 3), joints.shape
    bones = ref_bones_from_joints(joints)

    model = ShapeNet()
    params = model.init(jax.random.key(0), jnp.zeros((1, 15)))["params"]
    with open(args.shapenet, "rb") as f:
        params = serialization.from_bytes(params, f.read())
    beta = np.asarray(
        model.apply({"params": params}, jnp.asarray(bones, jnp.float32))
    )
    if args.out_beta:
        np.save(args.out_beta, beta)
        print(f"saved betas: {args.out_beta}")

    mano = ManoModel(args.mano)
    recon = np.asarray(relative_bone_lengths(mano, jnp.asarray(beta)))
    err = align_bone_len_ratio(recon, bones)
    print(f"dl regression error (sum per-bone MAE): {err.sum():.5f}")
    print("per-bone:", np.array2string(err, precision=4))


def _synthetic_comparison(args):
    """PSO vs LM vs ShapeNet on synthetic targets (optimize_shape.py)."""
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
