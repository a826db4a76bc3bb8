"""detnet fine-tune throughput on the attached chip.

Same methodology as bench.py: K chained steps in one jitted fori_loop
with a traced trip count, fetch-synchronized, two trip counts cancel
the host round trip. Prints one JSON line.

  python scripts/bench_detnet.py        # rn50 @128^2, batch 128
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from simhand_tpu.finetune.detloss import det_loss
    from simhand_tpu.finetune.detnet import DetNet
    from simhand_tpu.train.state import TrainState

    B = int(os.environ.get("BENCH_BATCH", "128"))
    side = int(os.environ.get("BENCH_SIDE", "128"))
    steps = int(os.environ.get("BENCH_STEPS", "20"))
    backbone = os.environ.get("BENCH_MODEL", "50")
    bn_sg = os.environ.get("BENCH_BN_SG", "0") == "1"

    model = DetNet(resnet_size=backbone, dtype=jnp.bfloat16,
                   bn_stop_gradient_stats=bn_sg,
                   maxpool=os.environ.get("BENCH_MAXPOOL", "xla"))
    variables = model.init(jax.random.key(0), jnp.zeros((1, side, side, 3)))
    tx = optax.adam(1e-4)
    state = TrainState.create(
        apply_fn=model.apply, params=variables["params"], tx=tx,
        batch_stats=variables["batch_stats"],
    )

    rng = np.random.default_rng(0)
    r = model.hm_res
    batch = {
        "img": jnp.asarray(rng.normal(size=(B, side, side, 3)), jnp.float32),
        "hm": jnp.asarray(rng.uniform(0, 1, (B, r, r, 21)), jnp.float32),
        "dm": jnp.asarray(rng.normal(size=(B, r, r, 21, 3)), jnp.float32),
        "lm": jnp.asarray(rng.normal(size=(B, r, r, 21, 3)), jnp.float32),
        "hm_veil": jnp.ones((B, 21), jnp.float32),
        "flag_3d": jnp.ones((B,), jnp.float32),
    }

    @jax.jit
    def run(state, batch, n):
        def body(_, carry):
            s, _ = carry

            def loss_fn(params):
                preds, mutated = model.apply(
                    {"params": params, "batch_stats": s.batch_stats},
                    batch["img"], train=True, mutable=["batch_stats"],
                )
                total, _ = det_loss(
                    preds, batch["hm"], batch["dm"], batch["lm"],
                    batch["hm_veil"], batch["flag_3d"],
                )
                return total, mutated["batch_stats"]

            (loss, stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                s.params
            )
            s = s.apply_gradients(grads=grads).replace(batch_stats=stats)
            return s, loss

        _, loss = jax.lax.fori_loop(0, n, body, (state, jnp.float32(0)))
        return loss

    k_small = max(steps // 4, 2)
    k_big = max(steps, k_small + 4)
    assert np.isfinite(float(run(state, batch, k_small)))

    def timed(n):
        t0 = time.perf_counter()
        out = float(run(state, batch, n))
        assert np.isfinite(out)
        return time.perf_counter() - t0

    t_small = min(timed(k_small) for _ in range(3))
    t_big = min(timed(k_big) for _ in range(3))
    step_time = max((t_big - t_small) / (k_big - k_small), 1e-9)

    print(json.dumps({
        "metric": "detnet_finetune_images_per_sec_per_chip",
        "value": round(B / step_time, 2),
        "unit": "img/s/chip",
        "step_ms": round(step_time * 1e3, 2),
    }))


if __name__ == "__main__":
    main()
