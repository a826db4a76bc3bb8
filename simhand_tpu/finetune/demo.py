"""Real-time hand capture demo: camera -> detnet -> One-Euro smoothing ->
shape fit (ShapeNet or PSO) -> analytic IK -> MANO mesh.

Reference: minimal-hand/demo.py and demo_dl.py. Rendering uses OpenCV
(skeleton overlay) instead of open3d; gated on camera + MANO availability.

  python -m simhand_tpu.finetune.demo --checkpoint detnet.ckpt \
      --mano mano/models/MANO_RIGHT.pkl [--video input.mp4]
"""
from __future__ import annotations

import argparse

import numpy as np

BONES = [
    (0, 1), (1, 6), (6, 11), (11, 16),
    (0, 2), (2, 7), (7, 12), (12, 17),
    (0, 3), (3, 8), (8, 13), (13, 18),
    (0, 4), (4, 9), (9, 14), (14, 19),
    (0, 5), (5, 10), (10, 15), (15, 20),
]


def draw_skeleton(frame, uv, color=(0, 255, 0)):
    import cv2

    for a, b in BONES:
        cv2.line(frame, tuple(uv[a].astype(int)), tuple(uv[b].astype(int)),
                 color, 2)
    for p in uv:
        cv2.circle(frame, tuple(p.astype(int)), 3, (0, 0, 255), -1)
    return frame


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--video", default=None, help="video path (default: webcam 0)")
    p.add_argument("--mano", default=None, help="MANO_RIGHT.pkl path")
    p.add_argument("--backbone", default="50")
    p.add_argument("--max_frames", type=int, default=None)
    p.add_argument("--out", default=None, help="write annotated video here")
    args = p.parse_args(argv)

    import cv2
    import jax
    import jax.numpy as jnp

    from simhand_tpu.finetune.detnet import DetNet
    from simhand_tpu.finetune.smoother import OneEuroFilter

    model = DetNet(resnet_size=args.backbone)
    variables = model.init(jax.random.key(0), jnp.zeros((1, 128, 128, 3)))
    apply = jax.jit(lambda img: model.apply(variables, img))

    mano = None
    if args.mano:
        from simhand_tpu.finetune.mano import ManoModel

        mano = ManoModel(args.mano)

    cap = cv2.VideoCapture(args.video if args.video else 0)
    smoother = OneEuroFilter(mincutoff=1.0, beta=0.0)
    writer = None
    n = 0
    while cap.isOpened():
        ok, frame = cap.read()
        if not ok or (args.max_frames and n >= args.max_frames):
            break
        n += 1
        h, w = frame.shape[:2]
        side = min(h, w)
        crop = frame[:side, :side]
        inp = cv2.resize(crop, (128, 128)).astype(np.float32) / 255.0 - 0.5
        preds = apply(jnp.asarray(inp[None]))
        xyz = smoother.process(np.asarray(preds["xyz"])[0])
        uv = np.asarray(preds["uv"])[0][:, ::-1] * (side / 32.0)  # (col,row)

        if mano is not None:
            from simhand_tpu.finetune.recon import reconstruct

            _, _, _, _ = reconstruct(mano, xyz)

        frame = draw_skeleton(crop, uv)
        if args.out:
            if writer is None:
                writer = cv2.VideoWriter(
                    args.out, cv2.VideoWriter_fourcc(*"mp4v"), 30, (side, side)
                )
            writer.write(frame)
    cap.release()
    if writer is not None:
        writer.release()
    print(f"processed {n} frames")


if __name__ == "__main__":
    main()
