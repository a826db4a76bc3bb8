"""int8 MXU probe: is a quantized serving path worth building on this chip?

v5e peak is 394 TOPS int8 vs 197 TFLOPS bf16 — IF XLA lowers int8
dot/conv onto the MXU's int8 path. This microbench times, with the
fori_loop/fetch methodology (CLAUDE.md — block_until_ready does not
synchronize over the tunnel):

* bf16 matmul vs int8(xint32) matmul at encoder 1x1-conv shapes;
* bf16 3x3 conv vs int8 3x3 conv (lax.conv_general_dilated,
  preferred_element_type=int32) at rn50 layer shapes.

One JSON line per case. Decision rule: int8 must beat bf16 by >1.5x at
the big shapes to justify a quantized inference path (dequant epilogues
and per-channel scales eat part of the win).
"""
from __future__ import annotations

import json
import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed_loop(step, init, steps):
    """Chained fori_loop, two trip counts, min-of-3 — bench.py protocol."""
    import jax

    @jax.jit
    def run(x, n):
        return jax.lax.fori_loop(0, n, lambda _, c: step(c), x)

    k_small, k_big = max(steps // 4, 2), steps
    assert np.isfinite(float(np.asarray(run(init, k_small)).ravel()[0].astype(np.float64)))

    def t(n):
        t0 = time.perf_counter()
        v = np.asarray(run(init, n)).ravel()[0]
        assert np.isfinite(float(v.astype(np.float64)))
        return time.perf_counter() - t0

    t_small = min(t(k_small) for _ in range(3))
    t_big = min(t(k_big) for _ in range(3))
    return max((t_big - t_small) / (k_big - k_small), 1e-9)


def bench_matmul(m, k, n, steps):
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    flops = 2.0 * m * k * n

    a16 = jnp.asarray(rng.normal(size=(m, k)), jnp.bfloat16)
    b16 = jnp.asarray(rng.normal(size=(k, n)), jnp.bfloat16)

    def step16(c):
        # carry->input dependence so the loop cannot be hoisted. The
        # carry must (a) consume EVERY output element through a
        # nonlinearity — a sliced carry lets XLA dead-code the matmul
        # down to one dot-row (measured: "10,407 TFLOPS") and a plain
        # sum is algebraically linear in c — and (b) stay bounded (a
        # raw feedback overflows bf16 by ~trip 40 — measured). Both
        # arms carry the identical reduce epilogue (~10% of the matmul
        # time at these shapes) so the ratio stands.
        y = (a16 + c[0, 0]) @ b16
        return jnp.tanh(jnp.mean(jnp.tanh(y))).reshape(1, 1)

    dt16 = timed_loop(lambda c: step16(c), jnp.zeros((1, 1), jnp.bfloat16), steps)

    a8 = jnp.asarray(rng.integers(-127, 127, size=(m, k)), jnp.int8)
    b8 = jnp.asarray(rng.integers(-127, 127, size=(k, n)), jnp.int8)

    def step8(c):
        y = jnp.dot((a8 + c[0, 0]).astype(jnp.int8), b8,
                    preferred_element_type=jnp.int32)
        # % blocks the linear-in-c simplification; full-sum keeps every
        # element live (see step16)
        s = jnp.sum(y % 127)
        return (s % 127).astype(jnp.int8).reshape(1, 1)

    dt8 = timed_loop(lambda c: step8(c), jnp.zeros((1, 1), jnp.int8), steps)
    print(json.dumps({
        "case": f"matmul_{m}x{k}x{n}",
        "bf16_ms": round(dt16 * 1e3, 4), "int8_ms": round(dt8 * 1e3, 4),
        "bf16_tflops": round(flops / dt16 / 1e12, 1),
        "int8_tops": round(flops / dt8 / 1e12, 1),
        "speedup": round(dt16 / dt8, 3),
    }))


def bench_conv(b, h, w, cin, cout, steps):
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    conv = partial(
        jax.lax.conv_general_dilated,
        window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    flops = 2.0 * b * h * w * cin * cout * 9

    x16 = jnp.asarray(rng.normal(size=(b, h, w, cin)), jnp.bfloat16)
    k16 = jnp.asarray(rng.normal(size=(3, 3, cin, cout)), jnp.bfloat16)

    def step16(c):
        y = conv(x16 + c[0, 0, 0, 0], k16)
        # full-reduce-through-nonlinearity carry — see bench_matmul
        return jnp.tanh(jnp.mean(jnp.tanh(y))).reshape(1, 1, 1, 1)

    dt16 = timed_loop(step16, jnp.zeros((1, 1, 1, 1), jnp.bfloat16), steps)

    x8 = jnp.asarray(rng.integers(-127, 127, size=(b, h, w, cin)), jnp.int8)
    k8 = jnp.asarray(rng.integers(-127, 127, size=(3, 3, cin, cout)), jnp.int8)

    def step8(c):
        y = conv((x8 + c[0, 0, 0, 0]).astype(jnp.int8), k8,
                 preferred_element_type=jnp.int32)
        s = jnp.sum(y % 127)  # see bench_matmul's step8
        return (s % 127).astype(jnp.int8).reshape(1, 1, 1, 1)

    try:
        dt8 = timed_loop(step8, jnp.zeros((1, 1, 1, 1), jnp.int8), steps)
        int8_ms, tops, speedup = (round(dt8 * 1e3, 4),
                                  round(flops / dt8 / 1e12, 1),
                                  round(dt16 / dt8, 3))
    except Exception as e:  # int8 conv may not lower on this backend
        int8_ms, tops, speedup = None, None, f"UNSUPPORTED: {type(e).__name__}"
    print(json.dumps({
        "case": f"conv3x3_{b}x{h}x{w}x{cin}->{cout}",
        "bf16_ms": round(dt16 * 1e3, 4), "int8_ms": int8_ms,
        "bf16_tflops": round(flops / dt16 / 1e12, 1),
        "int8_tops": tops, "speedup": speedup,
    }))


def main():
    steps = int(os.environ.get("BENCH_STEPS", "40"))
    which = os.environ.get("BENCH_INT8", "both")
    if which in ("matmul", "both"):
        # encoder 1x1 sites (M = B*H*W at 128^2 B=256) + a square anchor
        bench_matmul(8192, 2048, 2048, steps)
        bench_matmul(16384, 1024, 512, steps)
    if which in ("conv", "both"):
        bench_conv(256, 16, 16, 256, 256, steps)   # rn50 layer3 3x3
        bench_conv(256, 8, 8, 512, 512, steps)     # rn50 layer4 3x3
    print(json.dumps({"note": "decision rule: build quantized serving only "
                              "if speedup > 1.5 at the big shapes"}))


if __name__ == "__main__":
    main()
