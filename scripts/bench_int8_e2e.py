"""End-to-end int8 vs bf16 serving throughput on the attached chip.

The microbench (scripts/bench_int8.py) showed the v5e MXU int8 path is
real (1.4-1.9x per op); this measures whether the FULL quantized model
(serving/int8_infer.py: BN folded, W8A8, fused requant epilogues) keeps
the win once requantization and the f32 residual spine are paid.

Same fori_loop/fetch methodology as bench.py / bench_infer.py
(CLAUDE.md: block_until_ready does not synchronize over the tunnel; two
trip counts cancel the RTT; a carry->input dependence stops XLA from
hoisting the loop body).

  python scripts/bench_int8_e2e.py                 # encoder rn50 @128^2
  BENCH_SURFACE=detnet BENCH_BATCH=256 ...

Calibration runs on the host CPU backend (scale collection only — no
remote compile). Prints one JSON line per arm plus a speedup line.
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed_rate(run, images, steps, batch):
    def t(n):
        t0 = time.perf_counter()
        out = float(run(images, n))
        assert np.isfinite(out)
        return time.perf_counter() - t0

    k_small, k_big = max(steps // 4, 2), steps
    t(2)  # warm
    t_small = min(t(k_small) for _ in range(3))
    t_big = min(t(k_big) for _ in range(3))
    dt = max((t_big - t_small) / (k_big - k_small), 1e-9)
    return batch / dt, dt


def main():
    import jax
    import jax.numpy as jnp

    B = int(os.environ.get("BENCH_BATCH", "256"))
    side = int(os.environ.get("BENCH_SIDE", "128"))
    steps = int(os.environ.get("BENCH_STEPS", "40"))
    backbone = os.environ.get("BENCH_MODEL", "50")
    surface = os.environ.get("BENCH_SURFACE", "encoder")

    from simhand_tpu.serving.int8_infer import (build_detnet_int8,
                                                build_encoder_int8,
                                                random_calibration_batches)

    cpu = jax.devices("cpu")[0]
    calib = random_calibration_batches(side=side, batch=32, n=2)
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.normal(size=(B, side, side, 3)), jnp.float32)

    if surface == "detnet":
        from simhand_tpu.finetune.detnet import DetNet

        model = DetNet(resnet_size=backbone, dtype=jnp.bfloat16,
                       hm_res=side // 4)
        variables = model.init(jax.random.key(0),
                               jnp.zeros((1, side, side, 3)))
        int8_fwd, _ = build_detnet_int8(
            variables, backbone, calib_batches=calib, hm_res=side // 4,
            calib_device=cpu)

        # Both arms MUST consume the same output set: a uv-only carry
        # lets XLA dead-code the whole xyz/delta branch out of one arm
        # (measured: bf16 "26,920 img/s" vs the honest 16,298).
        def bf16_body(x):
            p = model.apply(variables, x, train=False)
            return (p["uv"].astype(jnp.float32).mean()
                    + p["xyz"].astype(jnp.float32).mean())

        def int8_body(x):
            p = int8_fwd(x)
            return (p["uv"].astype(jnp.float32).mean()
                    + p["xyz"].astype(jnp.float32).mean())
    else:
        from simhand_tpu.models import ContrastiveModel

        model = ContrastiveModel(resnet_size=backbone, dtype=jnp.bfloat16)
        variables = model.init(jax.random.key(0),
                               jnp.zeros((2, side, side, 3)))
        int8_fwd, _ = build_encoder_int8(
            variables, backbone, calib_batches=calib, calib_device=cpu)

        def bf16_body(x):
            emb, _ = model.apply(variables, x, train=False)
            return emb.astype(jnp.float32).mean()

        def int8_body(x):
            return int8_fwd(x)["embedding"].mean()

    def looped(body):
        @jax.jit
        def run(images, n):
            def step(_, acc):
                return acc + body(images + acc * 1e-20)

            return jax.lax.fori_loop(0, n, step, jnp.float32(0))

        return run

    out = {}
    for arm, body in (("bf16", bf16_body), ("int8", int8_body)):
        rate, dt = timed_rate(looped(body), images, steps, B)
        out[arm] = rate
        print(json.dumps({
            "metric": f"{surface}_{arm}_images_per_sec_per_chip",
            "value": round(rate, 2), "unit": "img/s/chip",
            "batch": B, "latency_ms": round(dt * 1e3, 3),
        }))
    print(json.dumps({"surface": surface,
                      "int8_speedup": round(out["int8"] / out["bf16"], 3)}))


if __name__ == "__main__":
    main()
