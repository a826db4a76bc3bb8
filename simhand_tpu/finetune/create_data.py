"""SIK1M data generator CLI: beta ~ 3*N(0,1) -> MANO relative bone
lengths, saved as data_bone.npy / data_shape.npy
(reference: minimal-hand/create_data.py).

  python -m simhand_tpu.finetune.create_data \\
      --mano mano/models/MANO_RIGHT.pkl --total 1000000 --out data/
"""
from __future__ import annotations

import argparse
import logging

logger = logging.getLogger("simhand_tpu.create_data")


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--mano", required=True, help="MANO_RIGHT.pkl path")
    p.add_argument("--total", type=int, default=1_000_000)
    p.add_argument("--out", required=True, help="output directory")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)
    logging.basicConfig(level=logging.INFO)

    from simhand_tpu.finetune.datasets import create_sik1m_data
    from simhand_tpu.finetune.mano import ManoModel

    mano = ManoModel(args.mano)
    create_sik1m_data(mano, args.total, args.out, seed=args.seed)
    logger.info("wrote %d (bone, shape) pairs to %s", args.total, args.out)


if __name__ == "__main__":
    main()
