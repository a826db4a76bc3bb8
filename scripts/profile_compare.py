"""Per-layer, per-image diff of two profile traces — the tool behind the
round-5 B=128-vs-B=256 attribution (SCALING.md "Per-chip batch" section).

Aggregates XLA-Ops device time by kernel family x encoder layer from two
`scripts/profile_step.py` trace dirs and prints the per-image ratio
(dividing each trace by its per-chip batch), so batch-size or variant
A/Bs read as "which layers actually moved" instead of one total.

  BENCH_BATCH=128 python scripts/profile_step.py --out /tmp/prof_b128
  BENCH_BATCH=256 python scripts/profile_step.py --out /tmp/prof_b256
  python scripts/profile_compare.py /tmp/prof_b128:128 /tmp/prof_b256:256
"""
from __future__ import annotations

import argparse
import collections
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts.profile_step import load_trace_events  # noqa: E402

FAMILIES = ("convert_reduce_fusion", "fusion", "copy-done", "slice-done",
            "select_and_scatter", "multiply_reduce_fusion", "copy")


def aggregate(log_dir: str, steps: int):
    """-> {(family, layer): ms_per_step} over the XLA Ops track."""
    events = load_trace_events(log_dir)
    tids = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tids[(e.get("pid"), e.get("tid"))] = e["args"]["name"]
    out: dict = collections.defaultdict(float)
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        if tids.get((e.get("pid"), e.get("tid"))) != "XLA Ops":
            continue
        family = re.sub(r"[.\d]+$", "", e["name"])
        tf_op = str((e.get("args") or {}).get("tf_op", ""))
        m = re.search(r"encoder/(layer\d|bn1|conv1)", tf_op)
        layer = (m.group(1) if m
                 else ("head+loss" if "encoder" not in tf_op else "enc-misc"))
        out[(family, layer)] += e["dur"] / 1000.0 / steps
    return out


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("traces", nargs=2,
                   help="two <trace_dir>:<per_chip_batch> specs; the "
                        "ratio printed is first/second per image")
    p.add_argument("--steps", type=int, default=3,
                   help="steps traced (profile_step.py default)")
    args = p.parse_args(argv)

    specs = []
    for spec in args.traces:
        d, _, b = spec.rpartition(":")
        specs.append((d, int(b)))
    (dir_a, b_a), (dir_b, b_b) = specs
    a = aggregate(dir_a, args.steps)
    b = aggregate(dir_b, args.steps)

    tot_a = sum(a.values())
    tot_b = sum(b.values())
    print(f"total: {tot_a:.2f} ms/step @B={b_a} vs {tot_b:.2f} @B={b_b} "
          f"-> per-image ratio {(tot_a / b_a) / (tot_b / b_b):.3f}")
    layers = sorted({k[1] for k in (*a, *b)})
    for fam in FAMILIES:
        rows = []
        for layer in layers:
            va = a.get((fam, layer), 0.0) / b_a
            vb = b.get((fam, layer), 0.0) / b_b
            if max(va, vb) * min(b_a, b_b) < 0.02:  # < 0.02 ms noise floor
                continue
            ratio = va / vb if vb else float("inf")
            rows.append(f"  {layer:>9s}: {va * b_a:6.2f} vs "
                        f"{vb * b_a:6.2f} ms/{b_a}img -> {ratio:.3f}")
        if rows:
            print(f"{fam}:")
            print("\n".join(rows))


if __name__ == "__main__":
    main()
