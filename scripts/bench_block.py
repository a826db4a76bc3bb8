"""Whole-block Mosaic A/B on the frozen serving forward (round-4
VERDICT next #3): does a single pallas program owning a layer4 identity
bottleneck beat XLA once the seams amortize?

Three arms, same fori_loop/fetch methodology as bench_infer.py (chained
carry so XLA cannot hoist; two trip counts cancel the tunnel RTT):

  flax    — ContrastiveModel.apply(train=False) bf16, the 5.8 ms
            baseline (43,798 img/s @ B=256)
  folded  — bf16 folded-BN serving walk (ops/bottleneck_block.py:
            FoldedBf16Ops), pure XLA — isolates folding from codegen
  pallas  — same walk with layer4_1 + layer4_2 (the identity
            bottlenecks) each run as ONE Mosaic program
            (ops/bottleneck_block.py:bottleneck_block)

  BENCH_BATCH=256 BENCH_SIDE=128 python scripts/bench_block.py
  BENCH_ARMS=folded,pallas ...   # subset (each arm = 1 remote compile)
  BENCH_BLOCKS=layer4_1,layer4_2 # which identity blocks pallas owns

Prints one JSON line per arm. Reference anchor: the torchvision
bottlenecks the reference wraps (src/models/resnet_model.py:6-58).
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _timed_rate(run, variables, images, steps, batch):
    k_small = max(steps // 4, 2)
    k_big = max(steps, k_small + 4)
    assert np.isfinite(float(run(variables, images, k_small)))

    def timed(n):
        t0 = time.perf_counter()
        out = float(run(variables, images, n))
        assert np.isfinite(out)
        return time.perf_counter() - t0

    t_small = min(timed(k_small) for _ in range(3))
    t_big = min(timed(k_big) for _ in range(3))
    step_time = max((t_big - t_small) / (k_big - k_small), 1e-9)
    return batch / step_time, step_time


def main():
    import jax
    import jax.numpy as jnp

    from simhand_tpu.models import ContrastiveModel
    from simhand_tpu.ops.bottleneck_block import make_folded_encoder_bf16

    B = int(os.environ.get("BENCH_BATCH", "256"))
    side = int(os.environ.get("BENCH_SIDE", "128"))
    steps = int(os.environ.get("BENCH_STEPS", "40"))
    backbone = os.environ.get("BENCH_MODEL", "50")
    arms = os.environ.get("BENCH_ARMS", "flax,folded,pallas").split(",")
    blocks = tuple(os.environ.get(
        "BENCH_BLOCKS", "layer4_1,layer4_2").split(","))
    tap_mode = os.environ.get("BENCH_TAP_MODE", "loop")
    tile_rows = os.environ.get("BENCH_TILE_ROWS")
    tile_rows = int(tile_rows) if tile_rows else None

    model = ContrastiveModel(resnet_size=backbone, dtype=jnp.bfloat16)
    variables = model.init(jax.random.key(0), jnp.zeros((2, side, side, 3)))
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.normal(size=(B, side, side, 3)), jnp.float32)

    def flax_fwd(images):
        emb, _ = model.apply(variables, images, train=False)
        return emb

    fwds = {
        "flax": flax_fwd,
        "folded": make_folded_encoder_bf16(variables, backbone),
        "pallas": make_folded_encoder_bf16(variables, backbone,
                                           pallas_blocks=blocks,
                                           tap_mode=tap_mode,
                                           tile_rows=tile_rows),
    }

    results = {}
    for arm in arms:
        fwd = fwds[arm]

        @jax.jit
        def run(variables, images, n, fwd=fwd):
            def body(_, acc):
                emb = fwd(images + acc * 1e-20)
                return acc + emb.astype(jnp.float32).mean()

            return jax.lax.fori_loop(0, n, body, jnp.float32(0))

        rate, step_time = _timed_rate(run, variables, images, steps, B)
        results[arm] = step_time
        print(json.dumps({
            "metric": f"encoder_forward_{arm}_images_per_sec_per_chip",
            "value": round(rate, 2),
            "unit": "img/s/chip",
            "batch": B,
            "latency_ms": round(step_time * 1e3, 3),
            "blocks": list(blocks) if arm == "pallas" else None,
            "tap_mode": tap_mode if arm == "pallas" else None,
            "tile_rows": tile_rows if arm == "pallas" else None,
        }), flush=True)

    if "folded" in results and "pallas" in results:
        print(json.dumps({
            "metric": "pallas_block_speedup_vs_folded_xla",
            "value": round(results["folded"] / results["pallas"], 4),
            "unit": "x",
            "delta_ms": round(
                (results["pallas"] - results["folded"]) * 1e3, 3),
        }))


if __name__ == "__main__":
    main()
