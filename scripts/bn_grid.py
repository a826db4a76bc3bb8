"""SG-BN robustness grid: the evidence behind promoting
``--bn_variant stop_grad`` (+12% train throughput, CLAUDE.md) from a
bench env var to a shippable config — or killing it.

Round-3 coverage was 3 corpus seeds with one budget-dependent sign flip
(seed 2 negative at 60 pretrain steps, positive at 120). This runs the
deterministic CPU transfer miniature (scripts/transfer_check.py) over
>=5 corpus seeds x {exact, stop_grad} at the 120-step budget that
resolved seed 2, plus an rn50 arm — the flagship backbone — at one seed
(round-3 VERDICT next #4; reference BN handling anchor:
src/models/base_model.py:32-53).

Writes one JSON line per cell to --out (append; already-present cells
are skipped, so the grid is resumable), then a summary line.

    PYTHONPATH= JAX_PLATFORMS=cpu python scripts/bn_grid.py \
        [--seeds 5] [--pretrain_steps 120] [--out bn_grid.jsonl]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _done(out_path: str) -> set:
    done = set()
    if os.path.exists(out_path):
        with open(out_path) as f:
            for line in f:
                try:
                    rec = json.loads(line)
                except json.JSONDecodeError:
                    continue
                if "cell" in rec:
                    done.add(tuple(rec["cell"]))
    return done


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--seeds", type=int, default=5)
    p.add_argument("--pretrain_steps", type=int, default=120)
    p.add_argument("--finetune_steps", type=int, default=60)
    p.add_argument("--rn50_seed", type=int, default=0,
                   help="corpus seed for the single rn50 arm (-1: skip)")
    p.add_argument("--rn50_pretrain_steps", type=int, default=60,
                   help="rn50 is ~8x rn18 CPU cost; the arm checks the "
                        "bottleneck architecture, not the budget curve")
    p.add_argument("--out", default="bn_grid.jsonl")
    p.add_argument("--variants", default="exact,stop_grad",
                   help="comma-separated bn variants; order = run order "
                        "(run the arm you need answered first first — "
                        "cells land in --out as they complete)")
    p.add_argument("--one_cell", default=None,
                   help="internal: run one [backbone, seed, variant, "
                        "pretrain_steps] cell and print its record")
    p.add_argument("--workdir", default=None)
    p.add_argument("--force_skip_random", action="store_true",
                   help="internal: a random-init arm for this backbone "
                        "already exists in the grid (it is corpus-seed- "
                        "and bn-variant-independent) — don't re-run it")
    args = p.parse_args(argv)

    if args.one_cell:
        from scripts.transfer_check import run_transfer_check

        backbone, seed, variant, psteps = json.loads(args.one_cell)
        res = run_transfer_check(
            args.workdir or tempfile.mkdtemp(prefix="bn_grid_cell_"),
            pretrain_steps=int(psteps),
            finetune_steps=args.finetune_steps,
            bn_variant=variant, corpus_seed=int(seed),
            skip_random=(variant != "exact") or args.force_skip_random,
            resnet_size=str(backbone),
        )
        print(json.dumps({"cell": [backbone, seed, variant, psteps],
                          "pretrained": res["pretrained"],
                          "random": res["random"]}))
        return

    import logging

    logging.basicConfig(level=logging.WARNING)
    variants = tuple(v.strip() for v in args.variants.split(",") if v.strip())
    cells = []
    for variant in variants:           # variant-major: the first-listed
        for seed in range(args.seeds):  # arm completes across all seeds
            cells.append(("18", seed, variant, args.pretrain_steps))
    if args.rn50_seed >= 0:
        for variant in variants:
            cells.append(("50", args.rn50_seed, variant,
                          args.rn50_pretrain_steps))

    done = _done(args.out)
    # the random-init arm is corpus-seed- AND bn-variant-independent
    # (it never touches the pretrain corpus) — run it once per backbone
    have_random = set()
    if os.path.exists(args.out):
        for line in open(args.out):
            try:
                rec = json.loads(line)
            except json.JSONDecodeError:
                continue
            if rec.get("random") is not None and "cell" in rec:
                have_random.add(rec["cell"][0])
    for backbone, seed, variant, psteps in cells:
        cell = [backbone, seed, variant, psteps]
        if tuple(cell) in done:
            continue
        workdir = tempfile.mkdtemp(prefix=f"bn_grid_{backbone}_{seed}_")
        # each cell runs in a FRESH subprocess: BASE_PATH, orbax
        # checkpoint state and jax compilation caches are per-cell, so
        # no cross-cell resume/collision is possible
        import subprocess

        cell_args = [
            sys.executable, os.path.abspath(__file__), "--one_cell",
            json.dumps(cell), "--finetune_steps",
            str(args.finetune_steps), "--workdir", workdir,
        ]
        if backbone in have_random:
            cell_args.append("--force_skip_random")
        env = {**os.environ, "PYTHONPATH": REPO, "JAX_PLATFORMS": "cpu",
               "BASE_PATH": os.path.join(workdir, "runs")}
        proc = subprocess.run(cell_args, env=env, capture_output=True,
                              text=True, timeout=14400)
        if proc.returncode:
            print(json.dumps({"cell": cell, "error": proc.stderr[-800:]}),
                  flush=True)
            continue
        rec = json.loads(proc.stdout.strip().splitlines()[-1])
        if rec.get("random") is not None:
            have_random.add(rec["cell"][0])
        with open(args.out, "a") as f:
            f.write(json.dumps(rec) + "\n")
        print(json.dumps(rec), flush=True)

    # summary: per-variant mean pretrained lossH / pck + per-seed margin
    rows = [json.loads(l) for l in open(args.out) if l.strip()]
    rows = [r for r in rows if "cell" in r]
    summary = {}
    for r in rows:
        b, seed, variant, _ = r["cell"]
        summary.setdefault(f"rn{b}_{variant}", []).append(
            r["pretrained"]["lossH_final"])
    print(json.dumps({
        "summary_lossH_mean": {k: sum(v) / len(v)
                               for k, v in summary.items()},
        "cells": len(rows),
    }))


if __name__ == "__main__":
    main()
