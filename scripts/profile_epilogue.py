"""Kernel-level trace of the BN+ReLU backward loop (both impls).

Reuses bench_epilogue's chained-loop program (already compile-cached) and
prints every XLA-Ops kernel with its per-iteration time — shows HOW XLA
structures the full backward (which the ka/kb microbenches can't).

  python scripts/profile_epilogue.py --shape 524288,256 --impl xla
"""
from __future__ import annotations

import argparse
import collections
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from profile_step import load_trace_events  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--shape", default="524288,256")
    p.add_argument("--impl", default="xla")
    p.add_argument("--steps", type=int, default=20)
    p.add_argument("--out", default="/tmp/epi_prof")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from simhand_tpu.models.bn_epilogue import _bn_relu_bwd

    m, c = (int(v) for v in args.shape.split(","))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(m, c)), jnp.bfloat16)
    g0 = jnp.asarray(rng.normal(size=(m, c)), jnp.bfloat16)
    scale = jnp.asarray(rng.normal(size=c) * 0.2 + 1.0, jnp.float32)
    bias = jnp.asarray(rng.normal(size=c) * 0.1, jnp.float32)
    mu = jnp.asarray(x.astype(jnp.float32).mean(0))
    var = jnp.asarray((x.astype(jnp.float32) ** 2).mean(0) - mu**2)
    inv = jax.lax.rsqrt(var + 1e-5)
    res = (x, mu, inv, scale, bias)

    def one(g, rs):
        dx, ds, db = _bn_relu_bwd(1e-5, args.impl, rs, g)
        return (dx + (ds[None] + db[None]).astype(dx.dtype) * 0
                ).astype(jnp.bfloat16)

    @jax.jit
    def run(g, rs, n):
        return jax.lax.fori_loop(0, n, lambda _, gg: one(gg, rs), g)

    float(run(g0, res, 2)[0, 0])  # compile + warm

    out_dir = f"{args.out}_{args.impl}_{m}x{c}"
    jax.profiler.start_trace(out_dir)
    float(run(g0, res, args.steps)[0, 0])
    jax.profiler.stop_trace()

    events = load_trace_events(out_dir)
    tids = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tids[(e.get("pid"), e.get("tid"))] = e["args"]["name"]
    per_name = collections.Counter()
    counts = collections.Counter()
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        if tids.get((e.get("pid"), e.get("tid"))) != "XLA Ops":
            continue
        per_name[e["name"]] += e["dur"]
        counts[e["name"]] += 1
        total += e["dur"]
    print(f"impl={args.impl} shape=({m},{c}) "
          f"total {total / 1e3 / args.steps:.3f} ms/iter")
    for name, dur in per_name.most_common(12):
        print(f"{dur / total * 100:5.1f}%  {dur / 1e3 / args.steps:7.3f} ms"
              f"  x{counts[name] / args.steps:.0f}  {name[:70]}")


if __name__ == "__main__":
    main()
