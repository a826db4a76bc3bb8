"""Two-process jax.distributed smoke: the multi-host seam for real.

VERDICT round-2 item 5: every mesh test runs single-process, so
``shard_batch``'s ``make_array_from_process_local_data`` branch (and the
replicated-state assembly) was design-only. This script launches TWO
``jax.distributed`` CPU processes (4 virtual devices each -> one 8-device
global mesh), runs ONE sharded simhand_w train step where each process
feeds only its local half of the global batch, and checks the loss
against the same step computed single-process on the full batch.

  python scripts/distributed_smoke.py            # launcher (prints JSON)
  python scripts/distributed_smoke.py --worker I # internal

Exit 0 iff multi-process loss == single-process loss (rtol 1e-5).
"""
from __future__ import annotations

import argparse
import json
import os
import socket
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

GLOBAL_BATCH = 16
SIDE = 64
LOCAL_DEVICES = 4
NPROC = 2


def _build_and_step(local_slice, fsdp: bool = False):
    """Shared by workers and the single-process reference: deterministic
    state + one sharded train step; returns the (replicated) loss.

    ``fsdp=True`` runs the ZeRO-3 path instead (parallel/fsdp.py): state
    sharded over the mesh, each process carving its shards from the full
    host value and feeding only its local batch slice — the multi-host
    FSDP seam for real."""
    import jax
    import numpy as np

    from simhand_tpu.models import ContrastiveModel
    from simhand_tpu.models.contrastive import ContrastiveConfig
    from simhand_tpu.parallel import create_mesh
    from simhand_tpu.parallel.mesh import replicate, shard_batch
    from simhand_tpu.train import OptimizerConfig, create_train_state
    from simhand_tpu.train.loop import make_train_step

    # bn_axis_name syncs BN across the shard_map replicas, which makes
    # the DP loss identical to the FSDP path's inherent global-batch BN
    model = ContrastiveModel(
        resnet_size="18", bn_axis_name=None if fsdp else "data"
    )
    cfg = ContrastiveConfig(
        experiment_type="simhand_w",
        augmentation=("crop", "rotate", "resize"),
        image_side=float(SIDE),
    )
    opt_cfg = OptimizerConfig(train_iters_per_epoch=10, epochs=2,
                              warmup_epochs=1)
    state = create_train_state(
        model, opt_cfg, jax.random.key(0), input_shape=(2, SIDE, SIDE, 3)
    )
    mesh = create_mesh()
    batch = _global_batch()
    local = {k: v[local_slice] for k, v in batch.items()}
    if fsdp:
        from simhand_tpu.parallel.fsdp import make_fsdp_train_step

        step, place_state, place_batch = make_fsdp_train_step(
            model, cfg, mesh, state
        )
        state = place_state(state)
        gbatch = place_batch(local)
    else:
        state = replicate(mesh, state)
        step = make_train_step(model, cfg, mesh=mesh)
        gbatch = shard_batch(mesh, local)
    _, metrics = step(state, gbatch)
    return float(np.asarray(jax.device_get(metrics["contrastive_loss"])))


MINE_N = 64          # corpus size for the --mine arm
MINE_K = 2
MINE_CHUNK = 8


def _mine_corpus():
    """Deterministic mining corpus: MINE_N hands over 8 videos."""
    import numpy as np

    rng = np.random.default_rng(7)
    kp = rng.uniform(0, 1, (MINE_N, 21, 2)).astype(np.float32)
    vids = np.repeat(np.arange(8, dtype=np.int32), MINE_N // 8)
    return kp, vids


def _mine_step(local_slice):
    """The ring top-k (lax.ppermute — the one collective the dp/fsdp
    arms don't cover) over the global mesh; every input sharded, each
    process feeding only its local rows. Returns this process's rows of
    (distances, indices) with their global row offsets."""
    import jax
    import numpy as np

    from simhand_tpu.mining.similar_hands import make_ring_topk_all
    from simhand_tpu.parallel import create_mesh
    from simhand_tpu.parallel.mesh import shard_batch

    kp, vids = _mine_corpus()
    ids = np.arange(MINE_N, dtype=np.int32)
    mesh = create_mesh()
    fn = make_ring_topk_all(mesh, k=MINE_K, query_chunk=MINE_CHUNK,
                            db_chunk=MINE_CHUNK)
    local = tuple(a[local_slice] for a in (kp, vids, ids, kp, vids, ids))
    gargs = shard_batch(mesh, local)
    d, i = fn(*gargs)
    rows_d, rows_i, starts = [], [], []
    for sd, si in zip(sorted(d.addressable_shards,
                             key=lambda s: s.index[0].start or 0),
                      sorted(i.addressable_shards,
                             key=lambda s: s.index[0].start or 0)):
        starts.append(int(sd.index[0].start or 0))
        rows_d.append(np.asarray(sd.data))
        rows_i.append(np.asarray(si.data))
    return starts, rows_d, rows_i


def _global_batch():
    import numpy as np

    B = GLOBAL_BATCH
    rng = np.random.default_rng(0)
    return {
        "transformed_image1": rng.normal(size=(B, SIDE, SIDE, 3)).astype(np.float32),
        "transformed_image2": rng.normal(size=(B, SIDE, SIDE, 3)).astype(np.float32),
        "jitter_x_1": rng.uniform(-10, 0, B).astype(np.float32),
        "jitter_x_2": rng.uniform(-10, 0, B).astype(np.float32),
        "jitter_y_1": rng.uniform(-10, 0, B).astype(np.float32),
        "jitter_y_2": rng.uniform(-10, 0, B).astype(np.float32),
        "angle_1": rng.uniform(-45, 45, B).astype(np.float32),
        "angle_2": rng.uniform(-45, 45, B).astype(np.float32),
        "joints1_aug": rng.uniform(0, SIDE, (B, 21, 3)).astype(np.float32),
        "joints2_aug": rng.uniform(0, SIDE, (B, 21, 3)).astype(np.float32),
        "joints1_ori": rng.uniform(0, 1, (B, 21, 3)).astype(np.float32),
        "joints2_ori": rng.uniform(0, 1, (B, 21, 3)).astype(np.float32),
    }


def run_worker(pid: int, port: int, out_path: str, fsdp: bool = False,
               mine: bool = False):
    # A hung cross-process collective (observed once in the 1-core env:
    # both workers asleep in a gloo wait, SIGTERM unhandled because the
    # main thread never re-enters Python) would otherwise time out the
    # launcher with zero diagnostics — dump every thread's stack to
    # stderr before the launcher's 600 s wait expires.
    import faulthandler

    faulthandler.dump_traceback_later(540, exit=False)

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=NPROC,
        process_id=pid,
    )
    assert jax.process_count() == NPROC
    assert len(jax.devices()) == NPROC * LOCAL_DEVICES
    if mine:
        per = MINE_N // NPROC
        starts, rows_d, rows_i = _mine_step(
            slice(pid * per, (pid + 1) * per))
        with open(out_path, "w") as f:
            json.dump({"process": pid, "starts": starts,
                       "d": [r.tolist() for r in rows_d],
                       "i": [r.tolist() for r in rows_i]}, f)
        return
    per = GLOBAL_BATCH // NPROC
    loss = _build_and_step(slice(pid * per, (pid + 1) * per), fsdp=fsdp)
    with open(out_path, "w") as f:
        json.dump({"process": pid, "loss": loss}, f)


def run_launcher(fsdp: bool = False, mine: bool = False):
    import numpy as np

    mode_args = (["--fsdp"] if fsdp else []) + (["--mine"] if mine else [])

    def attempt():
        """One spawn-and-wait of the NPROC worker ring on a fresh port +
        tmpdir. Returns (rcs, outs) or None on a hang (a worker stuck
        past 600 s — seen once on the 1-core host as a gloo collective
        where both workers slept forever; the workers dump their own
        stacks at 540 s, see run_worker)."""
        with socket.socket() as s:
            s.bind(("127.0.0.1", 0))
            port = s.getsockname()[1]
        tmp = tempfile.mkdtemp(prefix="dist_smoke_")
        procs, outs = [], []
        for pid in range(NPROC):
            out = os.path.join(tmp, f"worker{pid}.json")
            outs.append(out)
            env = dict(os.environ)
            env["PYTHONPATH"] = REPO
            env["XLA_FLAGS"] = (
                f"--xla_force_host_platform_device_count={LOCAL_DEVICES}"
            )
            env["JAX_PLATFORMS"] = "cpu"
            procs.append(subprocess.Popen(
                [sys.executable, os.path.abspath(__file__),
                 "--worker", str(pid), "--port", str(port), "--out", out]
                + mode_args,
                env=env,
            ))
        try:
            rcs = [p.wait(timeout=600) for p in procs]
        except subprocess.TimeoutExpired:
            for p in procs:  # SIGKILL: a gloo-blocked main thread
                p.kill()     # never runs Python signal handlers
            for p in procs:
                p.wait()
            return None
        return rcs, outs, tmp

    res = attempt()
    if res is None:
        # One retry on a fresh port: the only hang ever observed was a
        # non-deterministic connect/collective race (same code passed on
        # the immediately following fsdp/mine arms and on re-run). Two
        # consecutive hangs = a real bug, fail loudly.
        print("# worker ring hung after 600s; retrying on a fresh port",
              file=sys.stderr, flush=True)
        res = attempt()
        if res is None:
            print(json.dumps({"ok": False, "error": "worker ring hung "
                              "twice (600s each) — not a transient race"}))
            return 1
    rcs, outs, tmp = res
    if any(rcs):
        print(json.dumps({"ok": False, "worker_rcs": rcs}))
        return 1
    if mine:
        return _check_mine(outs)
    losses = [json.load(open(o))["loss"] for o in outs]

    # single-process reference on the full batch (8 local devices)
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO
    env["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={NPROC * LOCAL_DEVICES}"
    )
    env["JAX_PLATFORMS"] = "cpu"
    ref_out = os.path.join(tmp, "single.json")
    rc = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--single",
         "--out", ref_out] + mode_args,
        env=env, timeout=600,
    ).returncode
    if rc:
        print(json.dumps({"ok": False, "single_rc": rc}))
        return 1
    ref = json.load(open(ref_out))["loss"]

    same = bool(np.allclose(losses, losses[0]))
    match = bool(np.allclose(losses[0], ref, rtol=1e-5))
    print(json.dumps({
        "ok": same and match,
        "mode": "fsdp" if fsdp else "dp",
        "multiprocess_losses": losses,
        "single_process_loss": ref,
    }))
    return 0 if (same and match) else 1


def _check_mine(outs):
    """Assemble the two processes' ring-top-k rows and compare against
    the single-process whole-corpus oracle (topk_similar_all) — the
    third smoke arm: ``lax.ppermute`` over a REAL jax.distributed ring
    (round-3 VERDICT next #8; the mining north star, SURVEY §2.1)."""
    import jax
    import numpy as np

    # the oracle runs in the LAUNCHER process: pin cpu before the
    # backend initializes (the axon env otherwise routes — or, with a
    # stripped PYTHONPATH, fails to resolve — the tunnel platform)
    jax.config.update("jax_platforms", "cpu")
    from simhand_tpu.mining.similar_hands import topk_similar_all

    d = np.full((MINE_N, MINE_K), np.nan, np.float32)
    i = np.full((MINE_N, MINE_K), -2, np.int32)
    for o in outs:
        rec = json.load(open(o))
        for start, rd, ri in zip(rec["starts"], rec["d"], rec["i"]):
            rd, ri = np.asarray(rd, np.float32), np.asarray(ri, np.int32)
            d[start:start + len(rd)] = rd
            i[start:start + len(ri)] = ri
    assert np.isfinite(d).all(), "uncovered rows in assembled output"

    kp, vids = _mine_corpus()
    od, oi = topk_similar_all(
        kp, vids, kp, vids, k=MINE_K,
        query_chunk=MINE_CHUNK, db_chunk=MINE_CHUNK,
    )
    od, oi = np.asarray(od), np.asarray(oi)
    d_match = bool(np.allclose(d, od, rtol=1e-5, atol=1e-6))
    i_match = bool((i == oi).all())
    print(json.dumps({
        "ok": d_match and i_match,
        "mode": "mine_ring",
        "distances_match": d_match,
        "indices_match": i_match,
        "n": MINE_N, "k": MINE_K,
    }))
    return 0 if (d_match and i_match) else 1


def run_single(out_path: str, fsdp: bool = False):
    import jax

    jax.config.update("jax_platforms", "cpu")
    loss = _build_and_step(slice(None), fsdp=fsdp)
    with open(out_path, "w") as f:
        json.dump({"loss": loss}, f)


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--worker", type=int, default=None)
    p.add_argument("--single", action="store_true")
    p.add_argument("--port", type=int, default=None)
    p.add_argument("--out", default=None)
    p.add_argument("--fsdp", action="store_true", default=False,
                   help="run the ZeRO-3 sharded-state step instead of "
                        "replicated DP (parallel/fsdp.py multi-host seam)")
    p.add_argument("--mine", action="store_true", default=False,
                   help="run the ring top-k mining arm (lax.ppermute "
                        "over the 2-process ring) against the "
                        "single-process oracle")
    args = p.parse_args()
    if args.worker is not None:
        return run_worker(args.worker, args.port, args.out, fsdp=args.fsdp,
                          mine=args.mine)
    if args.single:
        return run_single(args.out, fsdp=args.fsdp)
    sys.exit(run_launcher(fsdp=args.fsdp, mine=args.mine))


if __name__ == "__main__":
    main()
