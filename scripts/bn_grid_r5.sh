#!/bin/sh
# Launcher for the round-5 240-step exact-certification SG-BN grid
# (SCALING.md "240-step exact-certification follow-up"). Lives in-repo
# because /tmp launchers die with host restarts (learned the hard way:
# the round-5 host restart lost /tmp/bn_grid_followup.sh mid-grid).
#
# Resumable: done cells in bn_grid_r5.jsonl are skipped on restart.
# Run ONLY when no other big CPU job (pytest suite, loader bench) is
# active -- this host has one bursty core (CLAUDE.md).
#
#   sh scripts/bn_grid_r5.sh            # nohup-launches the daemon
#
# Never kill the PARENT (scripts/bn_grid.py) while a cell child runs:
# the orphaned child's record is lost with the broken pipe. Kill the
# child too and let the restart skip done cells.
cd "$(dirname "$0")/.." || exit 1
nohup nice -n 19 python scripts/bn_grid.py \
    --out bn_grid_r5.jsonl \
    --pretrain_steps 240 \
    --variants exact,stop_grad \
    --seeds 5 \
    --rn50_seed -1 \
    > /tmp/bn_grid_r5.log 2>&1 &
echo "bn_grid r5 daemon pid $!"
