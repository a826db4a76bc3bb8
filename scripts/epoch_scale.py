"""Epoch-scale endurance run: 2.0M images of the exact flagship step.

BASELINE target #3 is "one 2.0M-image pre-training epoch" (the
reference's corpus size, /root/reference/README.md:22,39). This drives
the headline train step for ceil(2e6 / B) chained steps on the attached
chip and reports sustained throughput over the full-epoch duration —
an endurance datapoint (thermal/tunnel stability), not a new benchmark.

Execution is CHUNKED: one device program per --chunk steps (default 500,
~31 s at the rn50 rate), state carried on-device between calls. A single
monolithic 7,813-step program crashes the axon tunnel's worker watchdog
(measured round 3) — any long run over this link must chunk.

  BENCH_BATCH=256 python scripts/epoch_scale.py [--images 2000000]
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
    p.add_argument("--images", type=int, default=2_000_000)
    p.add_argument("--chunk", type=int, default=500)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    import bench

    setup = bench.build_bench_setup()
    model, cfg = setup["model"], setup["cfg"]
    state, batch = setup["state"], setup["batch"]
    B = setup["B"]
    from simhand_tpu.train.loop import _step_fn

    @jax.jit
    def run_chunk(state, batch, n):
        def body(_, carry):
            s, _ = carry
            s2, metrics = _step_fn(s, batch, model=model, cfg=cfg,
                                   axis_name=None)
            return s2, {"contrastive_loss": metrics["contrastive_loss"]}
        return jax.lax.fori_loop(
            0, n, body, (state, {"contrastive_loss": jnp.float32(0)})
        )

    # warm/compile, then fetch to synchronize (block_until_ready does not
    # synchronize over the tunnel)
    state, m = run_chunk(state, batch, 2)
    assert np.isfinite(float(m["contrastive_loss"]))

    total_steps = -(-args.images // B)
    done = 0
    t0 = time.perf_counter()
    while done < total_steps:
        n = min(args.chunk, total_steps - done)
        state, m = run_chunk(state, batch, n)
        done += n
        # fetch each chunk: synchronizes and catches divergence early
        loss = float(m["contrastive_loss"])
        assert np.isfinite(loss), f"non-finite loss at step {done}"
    dt = time.perf_counter() - t0

    print(json.dumps({
        "metric": "epoch_scale_images_per_sec_per_chip",
        "value": round(done * B / dt, 1),
        "unit": "img/s/chip",
        "images": done * B,
        "steps": done,
        "seconds": round(dt, 1),
        "final_loss": loss,
    }))


if __name__ == "__main__":
    main()
