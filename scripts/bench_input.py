"""Host input-pipeline throughput: can this host feed the chip?

ROUND-3 NOTE: with the default --n 4096 the whole corpus (~600 MB) is
page-cache resident after generation, which overstates sustained
throughput (the round-2 111k/s reading). For honest sustained numbers
use --n 8192+ and read SCALING.md's decomposition (native sharded
gather ~2.7 GB/s; raw batcher ~8.5k samples/s at its 2-thread cap).

Measures samples/sec of both production input paths over a synthetic
corpus (generated on first run):

  raw     packed memmap crop cache + native C++ gather -> uint8 batches
          for the fused on-device augmentation (--device_augment)
  cv2     full reference-exact HostAugmenter chain (crop/rotate/resize/
          color ops per view) -> augmented float batches

Prints one JSON line per mode. Compare against the chip's measured
4,077 img/s (bench.py): raw-path samples/s >= that means the host is
not the bottleneck.

  python scripts/bench_input.py [--n 4096] [--batch 256] [--threads 16]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--n", type=int, default=4096, help="corpus size")
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--threads", type=int, default=16)
    p.add_argument("--root", default="/tmp/simhand_input_bench")
    p.add_argument("--cache_size", type=int, default=None,
                   help="also bench a train-resolution cache at this crop "
                        "side (e.g. 160) next to the 224 default — the "
                        "--cache_size CLI lever; bytes/sample is the "
                        "measured binding constraint (SCALING.md)")
    args = p.parse_args()

    from simhand_tpu.data.augment_cv2 import AugmentFlags, AugmentParams
    from simhand_tpu.data.cache import CachedHand100MSource, build_crop_cache
    from simhand_tpu.data.pipeline import PretrainDataset, batch_iterator
    from simhand_tpu.data.sources import generate_synthetic_hand100m
    from simhand_tpu.data.sources.hand100m import Hand100MSource

    anno = os.path.join(
        args.root, "annotations", "100DOH", "Hand100M_100DOH_bench_v1-1.json"
    )
    marker = os.path.join(args.root, ".bench_corpus_n")
    stale = True
    if os.path.exists(anno) and os.path.exists(marker):
        with open(marker) as f:
            stale = f.read().strip() != str(args.n)
    if stale:
        # regenerate whenever --n changed — silently reusing a smaller
        # (page-cache-resident) corpus overstates sustained throughput
        import shutil

        shutil.rmtree(args.root, ignore_errors=True)
        generate_synthetic_hand100m(
            args.root, num_images=args.n, num_videos=64, scale="bench"
        )
        with open(marker, "w") as f:
            f.write(str(args.n))
    src = Hand100MSource(args.root, source="100doh", scale="bench")

    cache_dir = os.path.join(args.root, "cache")
    if not os.path.exists(os.path.join(cache_dir, "index.json")):
        build_crop_cache(src, cache_dir)
    cached = CachedHand100MSource(cache_dir)

    flags = AugmentFlags(crop=True, resize=True, rotate=True,
                         color_jitter=True, gaussian_blur=True)
    params = AugmentParams()

    def run(ds, raw, label):
        n_batches = len(ds) // args.batch
        it = batch_iterator(
            ds, args.batch, num_threads=args.threads, epoch=0, raw=raw
        )
        next(it)  # warm (cache pages, thread spin-up)
        t0 = time.perf_counter()
        consumed = 1
        for _ in it:
            consumed += 1
        dt = time.perf_counter() - t0
        sps = (consumed - 1) * args.batch / dt
        print(json.dumps({
            "metric": f"input_{label}_samples_per_sec",
            "value": round(sps, 1),
            "unit": "samples/s",
            "batches": n_batches,
        }))

    ds_raw = PretrainDataset(cached, "simhand_w", flags, params, seed=0)
    run(ds_raw, raw=True, label="raw_cache")

    if args.cache_size:
        src_small = Hand100MSource(args.root, source="100doh", scale="bench",
                                   crop_size=args.cache_size)
        small_dir = os.path.join(args.root, f"cache_{args.cache_size}")
        if not os.path.exists(os.path.join(small_dir, "index.json")):
            build_crop_cache(src_small, small_dir)
        cached_small = CachedHand100MSource(small_dir)
        ds_small = PretrainDataset(cached_small, "simhand_w", flags, params,
                                   seed=0)
        run(ds_small, raw=True, label=f"raw_cache{args.cache_size}")

    ds_cv2 = PretrainDataset(src, "simhand_w", flags, params, seed=0)
    run(ds_cv2, raw=False, label="cv2_host")


if __name__ == "__main__":
    main()
