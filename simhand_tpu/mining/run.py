"""Mining job CLI: pair every hand crop with its most-similar other-video
hands and write a Hand100M v1-1 annotation JSON.

  python -m simhand_tpu.mining.run \
      --input annotations_unpaired.json --output Hand100M_Ego4D_1m_v1-1.json \
      --k 1

Video identity is derived from the frame path (``<video_id>/frame_x.jpg``)
unless annotations carry an explicit ``video_id`` field.
"""
from __future__ import annotations

import argparse
import json
import os

import numpy as np


def video_ids_from_annotations(images: list[dict], annotations: list[dict]) -> np.ndarray:
    image_by_id = {img["id"]: img for img in images}
    names = {}
    vids = np.zeros(len(annotations), np.int32)
    for i, a in enumerate(annotations):
        if "video_id" in a:
            key = a["video_id"]
        else:
            file_name = image_by_id[a["image_id"]]["file_name"]
            base = os.path.basename(file_name)
            if "_frame" in base:
                # flat layout: <video_id>_frame<idx>.jpg
                key = os.path.join(
                    os.path.dirname(file_name), base.split("_frame")[0]
                )
            else:
                # nested layout: <video_id>/frame_<idx>.jpg
                key = os.path.dirname(file_name) or file_name
        vids[i] = names.setdefault(key, len(names))
    return vids


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--k", type=int, default=1)
    p.add_argument("--query_chunk", type=int, default=4096)
    p.add_argument("--db_chunk", type=int, default=8192)
    p.add_argument("--shard_db", action="store_true", default=False,
                   help="shard the keypoint DB over the mesh too and "
                        "rotate it around the ICI ring (ppermute) — for "
                        "corpora whose replicated DB would not fit HBM")
    args = p.parse_args(argv)

    import jax

    from simhand_tpu.mining.similar_hands import attach_positives, mine_similar_hands
    from simhand_tpu.parallel import create_mesh

    with open(args.input) as f:
        data = json.load(f)
    images, annotations = data["images"], data["annotations"]

    kp = np.stack(
        [
            np.asarray(a["keypoint_25d"], np.float32).reshape(21, 3)[:, :2]
            for a in annotations
        ]
    )
    vids = video_ids_from_annotations(images, annotations)

    mesh = create_mesh() if len(jax.devices()) > 1 else None
    d, i = mine_similar_hands(
        kp, vids, k=args.k,
        query_chunk=args.query_chunk, db_chunk=args.db_chunk,
        mesh=mesh, progress=True, shard_db=args.shard_db and mesh is not None,
    )
    annotations = attach_positives(annotations, d, i)

    os.makedirs(os.path.dirname(os.path.abspath(args.output)), exist_ok=True)
    with open(args.output, "w") as f:
        json.dump({"images": images, "annotations": annotations}, f)
    print(f"wrote {args.output} ({len(annotations)} annotations, k={args.k})")


if __name__ == "__main__":
    main()
