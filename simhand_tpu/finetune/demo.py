"""Real-time hand capture demo: camera -> detnet -> One-Euro smoothing ->
shape fit (ShapeNet or PSO) -> analytic IK -> MANO mesh.

Reference: minimal-hand/demo.py:69-139 and demo_dl.py. The reference
renders the MANO mesh in a separate open3d viewport; open3d is not in
this image, so the mesh side panel is drawn by finetune/render.py — a
software rasterizer with vertex-normal Lambertian shading and an
orbitable camera (``--spin`` rotates the view per frame like dragging
the o3d camera; ``--panel wireframe`` keeps the round-2 line render).

  python -m simhand_tpu.finetune.demo --video input.mp4 \
      --pretrain detnet.pth --mano mano/models/MANO_RIGHT.pkl \
      --out annotated.mp4
"""
from __future__ import annotations

import argparse

import numpy as np

from simhand_tpu.finetune.maps import SNAP_PARENT

# freihand/snap-order skeleton (detnet output order)
BONES = [(i, SNAP_PARENT[i]) for i in range(1, 21)]


def draw_skeleton(frame, uv, color=(0, 255, 0)):
    import cv2

    for a, b in BONES:
        cv2.line(frame, tuple(uv[a].astype(int)), tuple(uv[b].astype(int)),
                 color, 2)
    for p in uv:
        cv2.circle(frame, tuple(p.astype(int)), 3, (0, 0, 255), -1)
    return frame


def render_mesh_panel(verts: np.ndarray, faces: np.ndarray | None,
                      size: int) -> np.ndarray:
    """Orthographic cv2 wireframe of the MANO mesh (the open3d-viewport
    substitute): xy projection, centered and scaled into a size x size
    panel. Falls back to a vertex scatter when faces are absent."""
    import cv2

    panel = np.zeros((size, size, 3), np.uint8)
    v = np.asarray(verts, np.float64)
    xy = v[:, :2] - v[:, :2].mean(0)
    scale = 0.42 * size / max(np.abs(xy).max(), 1e-9)
    pts = (xy * scale + size / 2.0).astype(np.int32)
    pts[:, 1] = size - 1 - pts[:, 1]  # y up
    if faces is not None:
        polys = pts[np.asarray(faces, np.int32)]          # (F, 3, 2)
        cv2.polylines(panel, list(polys), True, (180, 180, 180), 1,
                      cv2.LINE_AA)
    else:
        for p in pts:
            cv2.circle(panel, tuple(p), 1, (180, 180, 180), -1)
    return panel


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--video", default=None, help="video path (default: webcam 0)")
    p.add_argument("--mano", default=None, help="MANO_RIGHT.pkl path")
    p.add_argument("--artifact", default=None,
                   help="serve from a StableHLO artifact "
                        "(simhand-export-serving --surface detnet); "
                        "replaces --pretrain/--backbone model setup")
    p.add_argument("--pretrain", default=None,
                   help="detnet .pth (torch interop) to load")
    p.add_argument("--backbone", default="50")
    p.add_argument("--shape_net", default=None,
                   help="trained ShapeNet params (flax msgpack): regress "
                        "the MANO shape per frame with One-Euro smoothing "
                        "(reference demo_dl.py:31-36,~100) instead of the "
                        "one-shot PSO fit")
    p.add_argument("--max_frames", type=int, default=None)
    p.add_argument("--out", default=None, help="write annotated video here")
    p.add_argument("--panel", default="shaded",
                   choices=["shaded", "wireframe"],
                   help="mesh viewport style (shaded = lit 3-D render, "
                        "the open3d-viewport equivalent)")
    p.add_argument("--spin", type=float, default=0.0,
                   help="orbit the mesh view by this many degrees per "
                        "frame (camera rotation, like o3d mouse orbit)")
    p.add_argument("--elevation", type=float, default=15.0,
                   help="camera elevation for the shaded panel (deg)")
    args = p.parse_args(argv)

    import cv2
    import jax
    import jax.numpy as jnp

    from simhand_tpu.finetune.detnet import DetNet
    from simhand_tpu.finetune.smoother import OneEuroFilter

    if args.artifact:
        # deployed path: the single-file StableHLO export carries the
        # weights — no model construction, no checkpoint
        from simhand_tpu.serving import load_artifact

        apply, _meta = load_artifact(args.artifact)
    else:
        model = DetNet(resnet_size=args.backbone)
        variables = model.init(jax.random.key(0),
                               jnp.zeros((1, 128, 128, 3)))
        if args.pretrain:
            import torch

            from simhand_tpu.finetune.torch_port_detnet import (
                torch_state_dict_to_detnet,
            )

            sd = torch.load(args.pretrain, map_location="cpu",
                            weights_only=True)
            params, batch_stats = torch_state_dict_to_detnet(sd)
            variables = {"params": params, "batch_stats": batch_stats}
        apply = jax.jit(lambda img: model.apply(variables, img))

    mano = None
    if args.mano:
        from simhand_tpu.finetune.mano import ManoModel

        mano = ManoModel(args.mano)

    shape_apply = None
    if args.shape_net:
        from flax import serialization

        from simhand_tpu.finetune.shape_net import ShapeNet

        shape_model = ShapeNet()
        shape_params = shape_model.init(
            jax.random.key(0), jnp.zeros((1, 15))
        )["params"]
        with open(args.shape_net, "rb") as f:
            shape_params = serialization.from_bytes(shape_params, f.read())
        shape_apply = jax.jit(
            lambda bones: shape_model.apply(
                {"params": shape_params}, bones
            )
        )

    cap = cv2.VideoCapture(args.video if args.video else 0)
    smoother = OneEuroFilter(mincutoff=1.0, beta=0.0)
    # demo_dl.py smooths the regressed shape with its own filter
    # (shape_fliter = OneEuroFilter(4.0, 0.0))
    shape_smoother = OneEuroFilter(mincutoff=4.0, beta=0.0)
    writer = None
    beta = None
    n = 0
    while cap.isOpened():
        ok, frame = cap.read()
        if not ok or (args.max_frames and n >= args.max_frames):
            break
        n += 1
        h, w = frame.shape[:2]
        side = min(h, w)
        # center square crop; model input is RGB (training images are
        # RGB — the reference demo flips cv2's BGR channels, demo.py:71)
        y0, x0 = (h - side) // 2, (w - side) // 2
        crop = frame[y0 : y0 + side, x0 : x0 + side]
        rgb = cv2.cvtColor(crop, cv2.COLOR_BGR2RGB)
        inp = cv2.resize(rgb, (128, 128)).astype(np.float32) / 255.0 - 0.5
        preds = apply(jnp.asarray(inp[None]))
        xyz = smoother.process(np.asarray(preds["xyz"])[0])
        uv = np.asarray(preds["uv"])[0][:, ::-1] * (side / 32.0)  # (col,row)

        frame_out = draw_skeleton(crop, uv)
        if mano is not None:
            from simhand_tpu.finetune.recon import reconstruct

            if shape_apply is not None:
                # DL route (demo_dl.py): bone lengths of the smoothed
                # prediction -> ShapeNet beta every frame, One-Euro
                # smoothed
                from simhand_tpu.finetune.lm_fit import ref_bones_from_joints

                bones = ref_bones_from_joints(xyz[None])
                beta = shape_smoother.process(
                    np.asarray(shape_apply(jnp.asarray(bones, jnp.float32)))[0]
                )
            # else: beta fitted once on the first frame (reference:
            # demo.py fits the shape once, then tracks pose per frame)
            verts, _, _, beta = reconstruct(mano, xyz, beta=beta)
            if args.panel == "shaded" and mano.faces is not None:
                from simhand_tpu.finetune.render import render_mesh_shaded

                panel = render_mesh_shaded(
                    verts, mano.faces, side,
                    azimuth_deg=args.spin * n,
                    elevation_deg=args.elevation,
                )
            else:
                panel = render_mesh_panel(verts, mano.faces, side)
            frame_out = np.concatenate([frame_out, panel], axis=1)
        if args.out:
            if writer is None:
                writer = cv2.VideoWriter(
                    args.out, cv2.VideoWriter_fourcc(*"mp4v"), 30,
                    (frame_out.shape[1], frame_out.shape[0]),
                )
            writer.write(frame_out)
    cap.release()
    if writer is not None:
        writer.release()
    print(f"processed {n} frames")


if __name__ == "__main__":
    main()
