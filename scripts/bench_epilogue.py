"""On-chip microbenchmark: BN+ReLU backward — XLA codegen vs Pallas kernels.

Times ONLY the backward (the round-1 profile's hot path: masked dual
reduce + dx elementwise, 4 plane reads + 1 plane write) by chaining
g <- dx through a fori_loop inside one jitted program and fetching the
result (the only reliable sync over the tunnel — CLAUDE.md).

Per rn50 @128x128 B=512-images hot shape, prints one JSON line:
  {"shape": [M, C], "impl": ..., "ms": ..., "gbps": ..., "bw_frac": ...}
bw_frac = achieved fraction of the v5e ~819 GB/s HBM roofline for the
5-plane traffic floor.

Usage: python scripts/bench_epilogue.py [--impls xla,pallas] [--steps 30]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HBM_GBPS = {"v5 lite": 819.0, "v5e": 819.0, "v5p": 2765.0, "v4": 1228.0,
            "v6e": 1640.0, "v6 lite": 1640.0}


def device_gbps(device) -> float:
    kind = getattr(device, "device_kind", "cpu").lower()
    for key, val in HBM_GBPS.items():
        if key in kind:
            return val
    return 50.0


# rn50 @ 128^2, 512 encoded images/step (bench batch 256 x 2 views):
# (M = B*H*W, C) for each BN site class
SHAPES = [
    (524288, 64),     # layer1 1x1/3x3 internals (32^2 spatial)
    (524288, 256),    # layer1 block outputs
    (131072, 512),    # layer2 outputs (16^2)
    (32768, 1024),    # layer3 outputs (8^2)
    (8192, 2048),     # layer4 outputs (4^2)
    (2097152, 64),    # stem bn1 (64^2)
]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--impls", default="xla,pallas")
    p.add_argument("--steps", type=int, default=30)
    p.add_argument("--shapes", default=None,
                   help="semicolon list 'M,C;M,C' to override")
    p.add_argument("--mode", default="bwd",
                   choices=["bwd", "fwdbwd", "ka", "kb"],
                   help="bwd = full backward; ka/kb = pallas kernel A "
                        "(masked dual reduce) / B (dx elementwise) alone")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from simhand_tpu.models.bn_epilogue import (
        _affine_consts,
        _bn_relu_bwd,
        bn_relu_train,
    )

    device = jax.devices()[0]
    peak = device_gbps(device)
    shapes = SHAPES
    if args.shapes:
        shapes = [tuple(int(v) for v in s.split(","))
                  for s in args.shapes.split(";")]

    rng = np.random.default_rng(0)
    for m, c in shapes:
        x = jnp.asarray(rng.normal(size=(m, c)), jnp.bfloat16)
        g0 = jnp.asarray(rng.normal(size=(m, c)), jnp.bfloat16)
        scale = jnp.asarray(rng.normal(size=c) * 0.2 + 1.0, jnp.float32)
        bias = jnp.asarray(rng.normal(size=c) * 0.1, jnp.float32)
        mu = jnp.asarray(x.astype(jnp.float32).mean(0))
        var = jnp.asarray(
            (x.astype(jnp.float32) ** 2).mean(0) - mu**2
        )
        inv = jax.lax.rsqrt(var + 1e-5)
        res = (x, mu, inv, scale, bias)

        for impl in args.impls.split(","):
            if args.mode in ("ka", "kb"):
                from simhand_tpu.models.bn_epilogue import (
                    _affine_consts as _ac,
                    masked_dual_reduce,
                    masked_dx,
                )

                A, B, C, D = _ac(mu, inv, scale, bias)
                P = scale * inv
                if args.mode == "ka":
                    def one(g, rs, _impl=impl):
                        if _impl == "xla":
                            g32 = g.astype(jnp.float32)
                            y = rs[0].astype(jnp.float32) * A + B
                            dy = jnp.where(y > 0, g32, 0.0)
                            xh = rs[0].astype(jnp.float32) * C + D
                            sdy = jnp.sum(dy, axis=0)
                            sdyx = jnp.sum(dy * xh, axis=0)
                        else:
                            sdy, sdyx = masked_dual_reduce(
                                g, rs[0], A, B, C, D)
                        # feed outputs back into g to serialize
                        return (g + (sdy + sdyx)[None].astype(g.dtype) * 0
                                ).astype(jnp.bfloat16)
                else:
                    def one(g, rs, _impl=impl):
                        if _impl == "xla":
                            g32 = g.astype(jnp.float32)
                            y = rs[0].astype(jnp.float32) * A + B
                            dy = jnp.where(y > 0, g32, 0.0)
                            xh = rs[0].astype(jnp.float32) * C + D
                            dx = (P * (dy - 0.1 - xh * 0.2)).astype(g.dtype)
                        else:
                            dx = masked_dx(g, rs[0], A, B, C, D, P,
                                           P * 0 + 0.1, P * 0 + 0.2, g.dtype)
                        return dx.astype(jnp.bfloat16)
            elif args.mode == "bwd":
                def one(g, rs, _impl=impl):
                    dx, ds, db = _bn_relu_bwd(1e-5, _impl, rs, g)
                    # keep a data dependency through ALL outputs
                    return (dx + (ds[None] + db[None]).astype(dx.dtype) * 0
                            ).astype(jnp.bfloat16)
            else:
                def one(g, rs, _impl=impl):
                    xx0, _, _, ss0, bb0 = rs
                    y, vjp = jax.vjp(
                        lambda xx, ss, bb: bn_relu_train(xx, ss, bb, 1e-5,
                                                         _impl),
                        xx0, ss0, bb0)
                    dx, ds, db = vjp(g)
                    return (dx + (ds[None] + db[None]).astype(dx.dtype) * 0
                            ).astype(jnp.bfloat16)

            @jax.jit
            def run(g, rs, n):
                return jax.lax.fori_loop(0, n, lambda _, gg: one(gg, rs), g)

            k_small = max(args.steps // 4, 2)
            k_big = max(args.steps, k_small + 4)
            float(run(g0, res, k_small)[0, 0])  # compile + warm

            def timed(n):
                t0 = time.perf_counter()
                out = run(g0, res, n)
                assert np.isfinite(float(out[0, 0]))
                return time.perf_counter() - t0

            t_small = min(timed(k_small) for _ in range(3))
            t_big = min(timed(k_big) for _ in range(3))
            dt = max((t_big - t_small) / (k_big - k_small), 1e-9)
            planes = {"ka": 2, "kb": 3, "fwdbwd": 7}.get(args.mode, 5)
            traffic = planes * m * c * 2  # bf16 planes moved
            gbps = traffic / dt / 1e9
            print(json.dumps({
                "shape": [m, c], "impl": impl, "mode": args.mode,
                "ms": round(dt * 1e3, 4),
                "gbps": round(gbps, 1),
                "bw_frac": round(gbps / peak, 3),
            }))


if __name__ == "__main__":
    main()
