"""Serving-path throughput: forward-only inference on the attached chip.

Two surfaces, same fori_loop/fetch-synchronized methodology as bench.py
(CLAUDE.md: block_until_ready does not synchronize over the tunnel; two
trip counts cancel the host round trip):

* detnet pose inference (the deployed fine-tuned model: heatmaps +
  location/delta maps -> 21 uvd joints) — the reference's serving path
  is minimal-hand's per-frame detnet forward (demo.py loop);
* contrastive-encoder embedding (the pretrain product: 2048-D features,
  e.g. for retrieval / re-mining).

  python scripts/bench_infer.py                 # both, rn50 @128^2
  BENCH_INFER=detnet BENCH_BATCH=256 ...        # one surface, B sweep

Prints one JSON line per surface. Inference runs frozen-BN bf16
(train=False), params donated nowhere (weights are reused every call).
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _timed_rate(run, state, images, steps, batch):
    import jax  # noqa: F401

    k_small = max(steps // 4, 2)
    k_big = max(steps, k_small + 4)
    assert np.isfinite(float(run(state, images, k_small)))

    def timed(n):
        t0 = time.perf_counter()
        out = float(run(state, images, n))
        assert np.isfinite(out)
        return time.perf_counter() - t0

    t_small = min(timed(k_small) for _ in range(3))
    t_big = min(timed(k_big) for _ in range(3))
    step_time = max((t_big - t_small) / (k_big - k_small), 1e-9)
    return batch / step_time, step_time


def bench_detnet(B, side, steps, backbone):
    import jax
    import jax.numpy as jnp

    from simhand_tpu.finetune.detnet import DetNet

    model = DetNet(resnet_size=backbone, dtype=jnp.bfloat16)
    variables = model.init(jax.random.key(0), jnp.zeros((1, side, side, 3)))
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.normal(size=(B, side, side, 3)), jnp.float32)

    @jax.jit
    def run(variables, images, n):
        def body(_, acc):
            # thread the carry into the input: without this serial
            # dependence XLA hoists the loop-invariant apply out of the
            # fori_loop and the "loop" times as zero work (observed)
            preds = model.apply(variables, images + acc * 1e-20,
                                train=False)
            return (acc + preds["uv"].astype(jnp.float32).mean()
                    + preds["xyz"].astype(jnp.float32).mean())

        return jax.lax.fori_loop(0, n, body, jnp.float32(0))

    rate, step_time = _timed_rate(run, variables, images, steps, B)
    print(json.dumps({
        "metric": "detnet_inference_images_per_sec_per_chip",
        "value": round(rate, 2),
        "unit": "img/s/chip",
        "batch": B,
        "latency_ms": round(step_time * 1e3, 3),
    }))


def bench_encoder(B, side, steps, backbone):
    import jax
    import jax.numpy as jnp

    from simhand_tpu.models import ContrastiveModel

    model = ContrastiveModel(resnet_size=backbone, dtype=jnp.bfloat16)
    variables = model.init(jax.random.key(0), jnp.zeros((2, side, side, 3)))
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.normal(size=(B, side, side, 3)), jnp.float32)

    @jax.jit
    def run(variables, images, n):
        def body(_, acc):
            # serial dependence on the carry — see bench_detnet
            emb, _ = model.apply(variables, images + acc * 1e-20,
                                 train=False)
            return acc + emb.astype(jnp.float32).mean()

        return jax.lax.fori_loop(0, n, body, jnp.float32(0))

    rate, step_time = _timed_rate(run, variables, images, steps, B)
    print(json.dumps({
        "metric": "encoder_inference_images_per_sec_per_chip",
        "value": round(rate, 2),
        "unit": "img/s/chip",
        "batch": B,
        "latency_ms": round(step_time * 1e3, 3),
    }))


def main():
    B = int(os.environ.get("BENCH_BATCH", "256"))
    side = int(os.environ.get("BENCH_SIDE", "128"))
    steps = int(os.environ.get("BENCH_STEPS", "40"))
    backbone = os.environ.get("BENCH_MODEL", "50")
    which = os.environ.get("BENCH_INFER", "both")
    if which in ("detnet", "both"):
        bench_detnet(B, side, steps, backbone)
    if which in ("encoder", "both"):
        bench_encoder(B, side, steps, backbone)


if __name__ == "__main__":
    main()
