#!/usr/bin/env bash
# BASELINE.json config #1: simclr ResNet-50, batch 32, 1k-image synthetic
# 100DOH-schema subset — the CPU-runnable end-to-end smoke
# (SURVEY.md §4 test plan item c). Generates the corpus on first run.
set -euo pipefail
cd "$(dirname "$0")/.."

export SMOKE_DIR="${SMOKE_DIR:-/tmp/simhand_smoke_1k}"

python - <<'PY'
import os
from simhand_tpu.data.sources import generate_synthetic_hand100m
root = os.environ["SMOKE_DIR"]
anno = os.path.join(root, "synthetic", "annotations", "100DOH",
                    "Hand100M_100DOH_smoke_v1-1.json")
if not os.path.exists(anno):
    generate_synthetic_hand100m(
        os.path.join(root, "synthetic"), num_images=1000, num_videos=40
    )
    print("generated 1k-image synthetic corpus at", root)
PY

exec python -m simhand_tpu.experiments.main \
    --experiment_type simclr --crop --resize \
    -sources synthetic -batch_size 32 -epochs "${EPOCHS:-2}" \
    -resnet_size 50 --data_dir "$SMOKE_DIR" \
    -experiment_name smoke_1k "$@"
