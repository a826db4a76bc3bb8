"""Serving-artifact validation + throughput on the attached chip.

Exports the encoder (or detnet) with platforms=("cpu","tpu"), round-trips
it through the on-disk artifact format, then:

1. parity: artifact outputs == direct apply outputs on the same batch
   (fetched values, rtol 2e-2 for bf16 argmax-free surfaces);
2. throughput: times the artifact call vs the direct jit apply with the
   fori_loop/fetch protocol (CLAUDE.md) — export must not cost perf.

  python scripts/bench_serving_artifact.py        # encoder rn50 @128^2
  BENCH_SURFACE=detnet BENCH_BATCH=64 ...

One JSON line at the end.
"""
from __future__ import annotations

import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(call, x, steps):
    import jax

    def once(n):
        t0 = time.perf_counter()
        acc = 0.0
        for _ in range(n):
            out = call(x)
            # fetch one scalar each call — the artifact's call boundary is
            # the unit being measured (per-request serving, not a fused
            # device loop), so per-call dispatch+RTT is part of the cost
            acc += float(jax.numpy.asarray(
                out["projection" if "projection" in out else "uv"]
            ).ravel()[0])
        assert np.isfinite(acc)
        return time.perf_counter() - t0

    once(2)  # warm the per-shape compile
    k_small, k_big = max(steps // 4, 2), steps
    t_small = min(once(k_small) for _ in range(3))
    t_big = min(once(k_big) for _ in range(3))
    return max((t_big - t_small) / (k_big - k_small), 1e-9)


def main():
    import jax
    import jax.numpy as jnp

    from simhand_tpu.serving import (build_detnet_forward,
                                     build_encoder_forward, export_forward,
                                     load_artifact, save_artifact)

    surface = os.environ.get("BENCH_SURFACE", "encoder")
    B = int(os.environ.get("BENCH_BATCH", "256"))
    side = int(os.environ.get("BENCH_SIDE", "128"))
    steps = int(os.environ.get("BENCH_STEPS", "20"))
    backbone = os.environ.get("BENCH_MODEL", "50")

    if surface == "detnet":
        from simhand_tpu.finetune.detnet import DetNet

        model = DetNet(resnet_size=backbone, dtype=jnp.bfloat16,
                       hm_res=side // 4)
        variables = model.init(jax.random.key(0),
                               jnp.zeros((1, side, side, 3)))
        forward = build_detnet_forward(variables, backbone=backbone,
                                       dtype=jnp.bfloat16, side=side)
    else:
        from simhand_tpu.models import ContrastiveModel

        model = ContrastiveModel(resnet_size=backbone, dtype=jnp.bfloat16)
        variables = model.init(jax.random.key(0),
                               jnp.zeros((2, side, side, 3)))
        forward = build_encoder_forward(variables, backbone=backbone,
                                        dtype=jnp.bfloat16)

    exported = export_forward(forward, side=side, batch="poly",
                              platforms=("cpu", "tpu"))
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "artifact.shlo")
        save_artifact(path, exported, {"surface": surface,
                                       "backbone": backbone, "side": side})
        size_mb = os.path.getsize(path) / 1e6
        call, _ = load_artifact(path)

        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(B, side, side, 3)), jnp.float32)
        direct = jax.jit(forward)

        out_a = jax.tree.map(np.asarray, call(x))
        out_d = jax.tree.map(np.asarray, direct(x))
        key = "projection" if surface == "encoder" else "uv"
        parity = bool(np.allclose(out_a[key], out_d[key],
                                  rtol=2e-2, atol=2e-2))

        dt_art = timed(call, x, steps)
        dt_dir = timed(direct, x, steps)

    print(json.dumps({
        "metric": f"{surface}_artifact_images_per_sec_per_chip",
        "value": round(B / dt_art, 2),
        "unit": "img/s/chip",
        "direct_value": round(B / dt_dir, 2),
        "artifact_ms": round(dt_art * 1e3, 3),
        "direct_ms": round(dt_dir * 1e3, 3),
        "artifact_mb": round(size_mb, 1),
        "parity": parity,
        "batch": B,
    }))


if __name__ == "__main__":
    main()
