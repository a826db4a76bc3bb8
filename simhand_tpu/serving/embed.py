"""Offline batch embedding: run the encoder artifact over a corpus.

The pretrain product is the encoder; its serving job is bulk feature
extraction (retrieval, re-mining, downstream probes). This CLI streams a
packed crop cache (data/cache.py) or an image directory through a
serving artifact (export.py) and writes ``(N, D)`` float32 embeddings:

  simhand-export-serving --surface encoder --pth resnet50_simhand.pth \\
      --out enc.shlo
  python -m simhand_tpu.serving.embed --artifact enc.shlo \\
      --cache /data/crop_cache --out embeddings.npy

TPU-shaped: crops travel to the device as uint8 (4x less H2D than f32),
resize + ImageNet normalization run on-device in a jitted preprocess,
and every batch has the same padded shape so the artifact compiles once.
"""
from __future__ import annotations

import argparse
import glob as globlib
import json
import os
import time

import numpy as np


def _preprocess_fn(side: int):
    import jax
    import jax.numpy as jnp

    from simhand_tpu.data.augment import IMAGENET_MEAN, IMAGENET_STD

    @jax.jit
    def preprocess(crops_u8):
        x = crops_u8.astype(jnp.float32) / 255.0
        x = jax.image.resize(
            x, (x.shape[0], side, side, 3), method="bilinear"
        )
        return (x - IMAGENET_MEAN) / IMAGENET_STD

    return preprocess


def _iter_cache(cache_dir: str, batch: int):
    from simhand_tpu.data.cache import CachedHand100MSource

    src = CachedHand100MSource(cache_dir)
    n = len(src)
    for lo in range(0, n, batch):
        idx = np.arange(lo, min(lo + batch, n))
        yield n, src.gather_crops(idx)


def _iter_images(pattern: str, batch: int):
    import cv2

    paths = sorted(globlib.glob(pattern))
    if not paths:
        raise FileNotFoundError(f"no files match {pattern!r}")
    n = len(paths)
    for lo in range(0, n, batch):
        imgs = []
        for p in paths[lo:lo + batch]:
            img = cv2.imread(p, cv2.IMREAD_COLOR)
            if img is None:
                raise IOError(f"unreadable image: {p}")
            imgs.append(img[:, :, ::-1])  # BGR -> RGB (training convention)
        side = max(i.shape[0] for i in imgs)
        imgs = [
            i if i.shape[:2] == (side, side)
            else cv2.resize(i, (side, side)) for i in imgs
        ]
        yield n, np.stack(imgs)


def embed_stream(call, batches, side: int, batch: int, what: str):
    """Pads every chunk to ``batch`` rows (one compiled shape), strips the
    pad rows after fetch. Returns (N, D) float32."""
    import jax.numpy as jnp

    preprocess = _preprocess_fn(side)
    out, total = [], None
    for total, crops in batches:
        k = crops.shape[0]
        if k < batch:
            crops = np.concatenate(
                [crops, np.zeros((batch - k,) + crops.shape[1:],
                                 crops.dtype)]
            )
        x = preprocess(jnp.asarray(crops))
        out.append(np.asarray(call(x)[what])[:k].astype(np.float32))
    emb = np.concatenate(out)
    assert total is None or emb.shape[0] == total
    return emb


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--artifact", required=True,
                   help="encoder serving artifact (.shlo)")
    p.add_argument("--cache", default=None,
                   help="packed crop cache directory (data/cache.py)")
    p.add_argument("--images", default=None,
                   help="glob of image files (e.g. 'crops/*.jpg')")
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--what", choices=("embedding", "projection"),
                   default="embedding")
    p.add_argument("--shard_devices", action="store_true",
                   help="shard each batch over ALL local devices (one "
                        "process drives the whole mesh; --batch must "
                        "divide by the device count)")
    p.add_argument("--out", required=True, help=".npy output path")
    args = p.parse_args(argv)
    if bool(args.cache) == bool(args.images):
        raise SystemExit("exactly one of --cache / --images is required")

    from simhand_tpu.serving import load_artifact

    call, meta = load_artifact(args.artifact)
    if args.shard_devices:
        from simhand_tpu.serving import shard_over_devices

        call, n_dev = shard_over_devices(call)
        if args.batch % n_dev:
            raise SystemExit(
                f"--batch {args.batch} not divisible by {n_dev} devices")
    side = int(meta.get("side", 128))
    batches = (_iter_cache(args.cache, args.batch) if args.cache
               else _iter_images(args.images, args.batch))
    t0 = time.perf_counter()
    emb = embed_stream(call, batches, side, args.batch, args.what)
    dt = time.perf_counter() - t0
    np.save(args.out, emb)
    print(json.dumps({
        "out": args.out, "shape": list(emb.shape), "what": args.what,
        "images_per_sec": round(emb.shape[0] / dt, 1),
        "seconds": round(dt, 2),
    }))


if __name__ == "__main__":
    main()
