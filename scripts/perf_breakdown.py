"""Perf breakdown on the attached chip: encoder-only vs full train step,
bf16 vs f32 (run manually; each program pays one remote compile).

  python scripts/perf_breakdown.py [encoder_bf16|encoder_f32|full_bf16]
"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import sys
import time

import numpy as np


def main(which: str = "encoder_bf16"):
    import jax
    import jax.numpy as jnp
    import optax

    from simhand_tpu.models import ContrastiveModel

    if which == "full_bf16":
        # the FULL train step is exactly what bench.py measures — run it
        # through the shared builder instead of a mislabeled duplicate
        # of the encoder-only program
        import bench
        from simhand_tpu.train.loop import _step_fn

        setup = bench.build_bench_setup()

        @jax.jit
        def run_full(state, batch, n):
            def body(_, carry):
                s, _ = carry
                s2, m = _step_fn(s, batch, model=setup["model"],
                                 cfg=setup["cfg"], axis_name=None)
                return s2, {"contrastive_loss": m["contrastive_loss"]}
            _, m = jax.lax.fori_loop(
                0, n, body,
                (state, {"contrastive_loss": jnp.float32(0)}))
            return m["contrastive_loss"]

        print(f"[{which}] compiling...", flush=True)
        t0 = time.perf_counter()
        _ = float(run_full(setup["state"], setup["batch"], 2))
        print(f"compile+2steps: {time.perf_counter() - t0:.1f}s", flush=True)

        def timed(n):
            t0 = time.perf_counter()
            _ = float(run_full(setup["state"], setup["batch"], n))
            return time.perf_counter() - t0

        t_small = min(timed(4) for _ in range(3))
        t_big = min(timed(16) for _ in range(3))
        step_t = (t_big - t_small) / 12
        print(f"[{which}] {step_t * 1e3:.2f} ms/step, "
              f"{setup['B'] / step_t:.0f} img/s", flush=True)
        return

    B, side = 256, 128
    dtype = jnp.float32 if which.endswith("f32") else jnp.bfloat16
    model = ContrastiveModel(resnet_size="50", dtype=dtype)
    variables = model.init(jax.random.key(0), jnp.zeros((2, side, side, 3)))
    params, stats = variables["params"], variables["batch_stats"]
    tx = optax.sgd(1e-3)
    opt_state = tx.init(params)

    rng = np.random.default_rng(0)
    images = jnp.asarray(
        rng.normal(size=(2 * B, side, side, 3)).astype(np.float32)
    )

    @jax.jit
    def run(params, opt_state, stats, n):
        def body(_, carry):
            params, opt_state, stats = carry

            def loss_fn(p):
                (emb, proj), mut = model.apply(
                    {"params": p, "batch_stats": stats}, images,
                    train=True, mutable=["batch_stats"],
                )
                return jnp.mean(proj.astype(jnp.float32) ** 2), mut["batch_stats"]

            (loss, stats2), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(params)
            updates, opt2 = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt2, stats2

        params, opt_state, stats = jax.lax.fori_loop(
            0, n, body, (params, opt_state, stats)
        )
        return jax.tree.leaves(params)[0].sum()

    print(f"[{which}] compiling...", flush=True)
    t0 = time.perf_counter()
    _ = float(run(params, opt_state, stats, 2))
    print(f"compile+2steps: {time.perf_counter() - t0:.1f}s", flush=True)

    def timed(n):
        t0 = time.perf_counter()
        _ = float(run(params, opt_state, stats, n))
        return time.perf_counter() - t0

    t_small = min(timed(4) for _ in range(3))
    t_big = min(timed(16) for _ in range(3))
    step = (t_big - t_small) / 12
    print(
        f"[{which}] {step * 1e3:.2f} ms/step, {2 * B / step:.0f} enc-img/s",
        flush=True,
    )


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "encoder_bf16")
