"""Model smoke script: builds the configured pre-training model and prints
its parameter tree summary (reference: src/experiments/model_tester.py —
instantiates PeCLR from config and prints it).

  python -m simhand_tpu.experiments.model_tester [--experiment_type peclr]
"""
from __future__ import annotations

import argparse


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--experiment_type", default="peclr")
    p.add_argument("--resnet_size", default="50")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from simhand_tpu.models import ContrastiveModel

    model = ContrastiveModel(resnet_size=args.resnet_size)
    variables = model.init(
        jax.random.key(0), jnp.zeros((2, 128, 128, 3)), train=False
    )
    n_params = sum(x.size for x in jax.tree.leaves(variables["params"]))
    print(f"experiment_type={args.experiment_type} resnet{args.resnet_size}")
    print(jax.tree.map(lambda x: x.shape, variables["params"]))
    print(f"total parameters: {n_params:,}")
    return model


if __name__ == "__main__":
    main()
