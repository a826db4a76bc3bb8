"""Per-kernel breakdown of the flagship train step on the attached chip.

Traces a few steps with jax.profiler, parses the chrome trace directly
(works over the remote tunnel — no tensorboard needed), and prints the
top device kernels by total time with their share of the step. Use it
to target pallas work at the actual hot fusions.

  python scripts/profile_step.py [--steps 3] [--out /tmp/simhand_prof]
  BENCH_BN_SG=1 python scripts/profile_step.py   # profile a variant
"""
from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def load_trace_events(log_dir: str):
    paths = glob.glob(
        os.path.join(log_dir, "**", "*.trace.json.gz"), recursive=True
    )
    if not paths:
        raise FileNotFoundError(f"no trace.json.gz under {log_dir}")
    with gzip.open(sorted(paths)[-1], "rt") as f:
        return json.load(f)["traceEvents"]


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--steps", type=int, default=3)
    p.add_argument("--out", default="/tmp/simhand_prof")
    p.add_argument("--top", type=int, default=15)
    args = p.parse_args()

    import jax

    # the EXACT benched program, via bench.py's shared builder (all
    # BENCH_* knobs honored — hand-duplicated construction drifted once
    # and profiled the baseline while labeling it a variant)
    import bench

    setup = bench.build_bench_setup()
    model, cfg = setup["model"], setup["cfg"]
    state, batch = setup["state"], setup["batch"]

    # step WITHOUT donation so it can repeat under the trace
    from functools import partial

    from simhand_tpu.train.loop import _step_fn

    step = jax.jit(partial(_step_fn, model=model, cfg=cfg, axis_name=None))
    state, m = step(state, batch)  # compile outside the trace
    _ = float(m["contrastive_loss"])

    jax.profiler.start_trace(args.out)
    for _ in range(args.steps):
        state, m = step(state, batch)
    _ = float(m["contrastive_loss"])
    jax.profiler.stop_trace()

    events = load_trace_events(args.out)
    # per-op device events live on the "XLA Ops" track
    import re

    tids = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tids[(e.get("pid"), e.get("tid"))] = e["args"]["name"]
    per_name = collections.Counter()
    families = collections.Counter()
    args_of = {}
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        if tids.get((e.get("pid"), e.get("tid"))) != "XLA Ops":
            continue
        name = e["name"]
        per_name[name] += e["dur"]
        families[re.sub(r"[.\d]+$", "", name)] += e["dur"]
        args_of.setdefault(name, e.get("args", {}))
        total += e["dur"]
    print(f"total device op time: {total / 1e3 / args.steps:.2f} ms/step")
    print("\n-- kernel families --")
    for name, dur in families.most_common(10):
        print(f"{dur / total * 100:5.1f}%  {dur / 1e3 / args.steps:8.2f} ms  {name}")
    print("\n-- top kernels --")
    for name, dur in per_name.most_common(args.top):
        src = str(args_of[name].get("tf_op", ""))[:70]
        print(f"{dur / total * 100:5.1f}%  {dur / 1e3 / args.steps:8.2f} ms  {name[:40]:40s} {src}")


if __name__ == "__main__":
    main()
