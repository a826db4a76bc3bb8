"""Verify the torch byte-contract against the REAL released artifact.

The one driver target this environment cannot check automatically
(BASELINE.json #2 / VERDICT round-2 "missing" #1) is that the vendored
320-key torchvision contract matches the v1.0 ``resnet50_simhand.pth``
release (reference hubconf.py:6-23) — downloading it needs egress. This
CLI makes the check one command the moment someone has the file:

  python scripts/verify_release_artifact.py /path/resnet50_simhand.pth

Checks, in order:
  1. every key/shape in the artifact matches the vendored contract
     (tests/test_torch_contract.py:torchvision_resnet50_contract)
  2. the artifact loads into the flax encoder (hub.load_resnet50_simhand)
  3. export back to torch round-trips bit-exactly
Prints one JSON line {"ok": bool, ...} and exits nonzero on mismatch.
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"
))


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("artifact", help="path to resnet50_simhand.pth")
    args = p.parse_args(argv)

    import numpy as np
    import torch

    from test_torch_contract import torchvision_resnet50_contract

    sd = torch.load(args.artifact, map_location="cpu", weights_only=True)
    if not isinstance(sd, dict):
        sd = sd.state_dict()
    sd = {k: v for k, v in sd.items() if not k.startswith("fc.")}

    contract = torchvision_resnet50_contract()
    contract = {k: v for k, v in contract.items() if not k.startswith("fc.")}
    problems = []
    for key, shape in contract.items():
        if key.endswith("num_batches_tracked"):
            continue  # counters, not weights; shape () vs (1,) is noise
        if key not in sd:
            problems.append(f"missing key: {key}")
        elif tuple(sd[key].shape) != tuple(shape):
            problems.append(
                f"shape mismatch {key}: artifact {tuple(sd[key].shape)} "
                f"vs contract {tuple(shape)}"
            )
    extra = [k for k in sd if k not in contract
             and not k.endswith("num_batches_tracked")]
    problems += [f"unexpected key: {k}" for k in extra]

    roundtrip_exact = None
    if not problems:
        from simhand_tpu.hub import load_resnet50_simhand
        from simhand_tpu.train.torch_port import save_torch_checkpoint

        params, stats = load_resnet50_simhand(args.artifact)
        out = args.artifact + ".roundtrip"
        save_torch_checkpoint(out, params, stats)
        sd2 = torch.load(out, map_location="cpu", weights_only=True)
        float_keys = [k for k in contract
                      if not k.endswith("num_batches_tracked")]
        missing = [k for k in float_keys if k not in sd2]
        roundtrip_exact = not missing and all(
            np.array_equal(np.asarray(sd[k]), np.asarray(sd2[k]))
            for k in float_keys
        )
        os.remove(out)
        if not roundtrip_exact:
            problems.append("torch->flax->torch round trip not bit-exact")

    ok = not problems
    print(json.dumps({
        "ok": ok,
        "keys_checked": len(contract),
        "roundtrip_exact": roundtrip_exact,
        "problems": problems[:20],
    }))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
