"""Two-process jax.distributed smoke (VERDICT round-2 item 5): the
multi-host seam — ``make_array_from_process_local_data`` in
parallel/mesh.py:shard_batch/replicate — exercised for real."""
import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
@pytest.mark.parametrize("mode", ["dp", "fsdp"])
def test_two_process_step_matches_single_process(mode):
    """2 coordinated CPU processes (4 devices each, one 8-device global
    mesh), each feeding its local half of the global batch, produce the
    same train-step loss as one process on the full batch — for both the
    replicated shard_map DP step and the ZeRO-3 FSDP step (each process
    carving its state shards from the full host value)."""
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO
    env.pop("XLA_FLAGS", None)
    cmd = [sys.executable, os.path.join(REPO, "scripts", "distributed_smoke.py")]
    if mode == "fsdp":
        cmd.append("--fsdp")
    out = subprocess.run(
        cmd, env=env, capture_output=True, text=True, timeout=1800,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    result = json.loads(out.stdout.strip().splitlines()[-1])
    assert result["ok"] and result["mode"] == mode, result
    assert result["multiprocess_losses"][0] == result["multiprocess_losses"][1]


@pytest.mark.slow
def test_two_process_ring_mining_matches_oracle():
    """The third smoke arm (round-3 VERDICT next #8): the DB-sharded
    ring top-k (lax.ppermute) over a REAL 2-process jax.distributed
    ring — queries AND database sharded across processes — returns the
    exact distances/indices of the single-process whole-corpus oracle
    (mining north star, SURVEY §2.1 / BASELINE target #1)."""
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO
    env.pop("XLA_FLAGS", None)
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts",
                                      "distributed_smoke.py"), "--mine"],
        env=env, capture_output=True, text=True, timeout=1800,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    result = json.loads(out.stdout.strip().splitlines()[-1])
    assert result["ok"] and result["mode"] == "mine_ring", result
    assert result["distances_match"] and result["indices_match"], result
