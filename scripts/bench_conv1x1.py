"""On-chip: pallas matmul+BN-stats-epilogue vs XLA conv+reduce structure.

The load-bearing experiment for the conv-epilogue route: if the pallas
kernel (read x, write y, stats ride the MXU output in VMEM) beats XLA's
conv custom-call + convert_reduce_fusion pair on the rn50 1x1 shapes,
owning the convs is worth building; if not, the XLA structure is the
measured ceiling.

  python scripts/bench_conv1x1.py [--shapes "524288,64,256;..."]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SHAPES = [
    (524288, 64, 256),    # layer1 conv3
    (524288, 256, 64),    # layer1 conv1 (block >= 1)
    (131072, 512, 128),   # layer2 conv1
    (8192, 512, 2048),    # layer4 conv3
]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--shapes", default=None)
    p.add_argument("--steps", type=int, default=30)
    p.add_argument("--fused_loader", action="store_true",
                   help="bench the BN-apply-in-loader chain link")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from simhand_tpu.ops.conv1x1 import conv1x1_stats

    shapes = SHAPES
    if args.shapes:
        shapes = [tuple(int(v) for v in s.split(","))
                  for s in args.shapes.split(";")]

    rng = np.random.default_rng(0)
    for m, cin, cout in shapes:
        x0 = jnp.asarray(rng.normal(size=(m, cin)) * 0.1, jnp.bfloat16)
        w = jnp.asarray(rng.normal(size=(cin, cout)) * 0.05, jnp.bfloat16)
        # ring for chaining: project y back to cin with a fixed matrix
        back = jnp.asarray(rng.normal(size=(cout, cin)) * 0.05, jnp.bfloat16)

        A = jnp.asarray(rng.normal(size=cin) * 0.2 + 1.0, jnp.float32)
        Bb = jnp.asarray(rng.normal(size=cin) * 0.1, jnp.float32)

        if args.fused_loader:
            # the chain link: BN-apply+relu of the producing layer runs in
            # the consuming matmul's loader (pallas) vs as its own fusion
            # pass (XLA)
            from simhand_tpu.ops.conv1x1 import conv1x1_bn_relu_stats

            def xla_once(x):
                xa = jnp.maximum(
                    x.astype(jnp.float32) * A + Bb, 0
                ).astype(jnp.bfloat16)
                y = jax.lax.dot_general(
                    xa, w, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ).astype(jnp.bfloat16)
                s1 = jnp.sum(y.astype(jnp.float32), axis=0)
                s2 = jnp.sum(jnp.square(y.astype(jnp.float32)), axis=0)
                return y, s1, s2

            def pallas_once(x):
                return conv1x1_bn_relu_stats(x, w, A, Bb)
        else:
            def xla_once(x):
                y = jax.lax.dot_general(
                    x, w, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ).astype(jnp.bfloat16)
                s1 = jnp.sum(y.astype(jnp.float32), axis=0)
                s2 = jnp.sum(jnp.square(y.astype(jnp.float32)), axis=0)
                return y, s1, s2

            def pallas_once(x):
                return conv1x1_stats(x, w)

        for impl, fn in (("xla", xla_once), ("pallas", pallas_once)):
            def one(x, _fn=fn):
                y, s1, s2 = _fn(x)
                # chain with a data dependency through y AND the stats
                x2 = jax.lax.dot_general(
                    y, back, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ).astype(jnp.bfloat16)
                return x2 + (s1[:1] + s2[:1]).astype(jnp.bfloat16) * 0

            @jax.jit
            def run(x, n):
                return jax.lax.fori_loop(0, n, lambda _, xx: one(xx), x)

            k_small = max(args.steps // 4, 2)
            k_big = max(args.steps, k_small + 4)
            float(run(x0, k_small)[0, 0])

            def timed(n):
                t0 = time.perf_counter()
                out = run(x0, n)
                assert np.isfinite(float(out[0, 0]))
                return time.perf_counter() - t0

            t_small = min(timed(k_small) for _ in range(3))
            t_big = min(timed(k_big) for _ in range(3))
            dt = max((t_big - t_small) / (k_big - k_small), 1e-9)
            # both impls share the chaining matmul; report raw iter time
            print(json.dumps({
                "shape": [m, cin, cout], "impl": impl,
                "fused_loader": bool(args.fused_loader),
                "ms": round(dt * 1e3, 4),
            }))


if __name__ == "__main__":
    main()
