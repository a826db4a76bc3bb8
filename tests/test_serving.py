"""Serving artifacts: export -> save -> load -> call, vs direct apply.

The deployable unit is a single StableHLO file with the weights baked in
(simhand_tpu/serving/export.py) — the TPU-native replacement for the
reference's load-a-.pth-into-the-module deployment (hubconf.py:6-23,
minimal-hand/demo.py per-frame forward).
"""
from __future__ import annotations

import json
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def _images(n, side, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.normal(size=(n, side, side, 3)), jnp.float32)


@pytest.fixture(scope="module")
def encoder_export(tmp_path_factory):
    from simhand_tpu.models import ContrastiveModel
    from simhand_tpu.serving import (build_encoder_forward, export_forward,
                                     save_artifact)

    model = ContrastiveModel(resnet_size="18", dtype=jnp.float32)
    variables = model.init(jax.random.key(0), jnp.zeros((2, 32, 32, 3)))
    forward = build_encoder_forward(variables, backbone="18",
                                    dtype=jnp.float32)
    exported = export_forward(forward, side=32, batch="poly",
                              platforms=("cpu",))
    path = str(tmp_path_factory.mktemp("srv") / "encoder.shlo")
    save_artifact(path, exported, {"surface": "encoder", "backbone": "18",
                                   "side": 32})
    return forward, path


def test_encoder_artifact_matches_direct_apply(encoder_export):
    from simhand_tpu.serving import load_artifact

    forward, path = encoder_export
    call, meta = load_artifact(path)
    assert meta["surface"] == "encoder" and meta["side"] == 32
    x = _images(3, 32)
    out, ref = call(x), forward(x)
    np.testing.assert_allclose(out["embedding"], ref["embedding"],
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(out["projection"], ref["projection"],
                               rtol=1e-5, atol=1e-5)


def test_batch_polymorphic_artifact_serves_any_batch(encoder_export):
    from simhand_tpu.serving import load_artifact

    forward, path = encoder_export
    call, _ = load_artifact(path)
    for n in (1, 5):
        x = _images(n, 32, seed=n)
        out = call(x)
        assert out["embedding"].shape == (n, 512)
        np.testing.assert_allclose(out["projection"], forward(x)["projection"],
                                   rtol=1e-5, atol=1e-5)


def test_artifact_rejects_foreign_file(tmp_path):
    from simhand_tpu.serving import load_artifact

    path = tmp_path / "not_an_artifact.shlo"
    path.write_bytes(b"PK\x03\x04 definitely a zip")
    with pytest.raises(ValueError, match="not a simhand_tpu serving"):
        load_artifact(str(path))


def test_detnet_artifact_round_trip(tmp_path):
    from simhand_tpu.finetune.detnet import DetNet
    from simhand_tpu.serving import (build_detnet_forward, export_forward,
                                     load_artifact, save_artifact)

    model = DetNet(resnet_size="18", dtype=jnp.float32, hm_res=16)
    variables = model.init(jax.random.key(1), jnp.zeros((1, 64, 64, 3)))
    forward = build_detnet_forward(variables, backbone="18",
                                   dtype=jnp.float32, side=64)
    exported = export_forward(forward, side=64, batch="poly",
                              platforms=("cpu",))
    path = str(tmp_path / "detnet.shlo")
    save_artifact(path, exported, {"surface": "detnet", "backbone": "18",
                                   "side": 64})
    call, _ = load_artifact(path)
    x = _images(2, 64, seed=3)
    out, ref = call(x), forward(x)
    assert (np.asarray(out["uv"]) == np.asarray(ref["uv"])).all()
    np.testing.assert_allclose(out["xyz"], ref["xyz"], rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(out["h_map"], ref["h_map"],
                               rtol=1e-5, atol=1e-5)


def test_multiplatform_lowering_cpu_tpu():
    """One artifact lowered for cpu AND tpu — validated here without a
    TPU attached (serving artifacts are built on CI boxes)."""
    from simhand_tpu.models import ContrastiveModel
    from simhand_tpu.serving import build_encoder_forward, export_forward

    model = ContrastiveModel(resnet_size="18", dtype=jnp.bfloat16)
    variables = model.init(jax.random.key(0), jnp.zeros((2, 32, 32, 3)))
    forward = build_encoder_forward(variables, backbone="18",
                                    dtype=jnp.bfloat16)
    exported = export_forward(forward, side=32, batch=4,
                              platforms=("cpu", "tpu"))
    assert exported.platforms == ("cpu", "tpu")


def test_quantized_artifact_smaller_and_accurate(encoder_export, tmp_path):
    """--quantize int8: weight-only int8 payload as an argument pytree
    (constants-baked dequant would fold back to f32 at trace time —
    measured). File shrinks ~4x; embeddings stay ~identical."""
    import os

    from simhand_tpu.models import ContrastiveModel
    from simhand_tpu.serving import (encoder_apply, export_apply_quantized,
                                     load_artifact, save_artifact)

    forward, f32_path = encoder_export
    model = ContrastiveModel(resnet_size="18", dtype=jnp.float32)
    variables = model.init(jax.random.key(0), jnp.zeros((2, 32, 32, 3)))
    apply = encoder_apply(backbone="18", dtype=jnp.float32)
    exported, weights = export_apply_quantized(
        apply, variables, side=32, batch="poly", platforms=("cpu",))
    q_path = str(tmp_path / "enc_i8.shlo")
    save_artifact(q_path, exported, {"surface": "encoder", "side": 32,
                                     "quantize": "int8"}, weights=weights)

    assert os.path.getsize(q_path) < 0.35 * os.path.getsize(f32_path)

    call, meta = load_artifact(q_path)
    assert meta["quantize"] == "int8" and meta["weights_len"] > 0
    x = _images(3, 32)
    a = np.asarray(forward(x)["embedding"])
    b = np.asarray(call(x)["embedding"])
    cos = (a * b).sum(1) / (np.linalg.norm(a, axis=1)
                            * np.linalg.norm(b, axis=1))
    assert cos.min() > 0.999
    # batch-polymorphic with the weights-arg calling convention
    assert call(_images(5, 32))["projection"].shape == (5, 128)


def test_embed_cli_over_crop_cache(encoder_export, tmp_path):
    """simhand-embed streams a packed crop cache through the encoder
    artifact: padded fixed-shape batches, device-side resize+normalize,
    output matches the direct forward on identically preprocessed crops."""
    pytest.importorskip("cv2")
    import jax.numpy as jnp

    from simhand_tpu.data.cache import (CachedHand100MSource,
                                        build_crop_cache)
    from simhand_tpu.data.sources import (Hand100MSource,
                                          generate_synthetic_hand100m)
    from simhand_tpu.serving.embed import _preprocess_fn, main as embed_main

    forward, artifact = encoder_export
    root = str(tmp_path / "h100m")
    generate_synthetic_hand100m(root, num_images=11, num_videos=2, side=64)
    cache_dir = str(tmp_path / "cache")
    build_crop_cache(
        Hand100MSource(root, source="100doh", scale="smoke"), cache_dir,
        shard_size=8)

    out = str(tmp_path / "emb.npy")
    embed_main(["--artifact", artifact, "--cache", cache_dir,
                "--batch", "4", "--out", out])
    emb = np.load(out)
    assert emb.shape == (11, 512) and np.isfinite(emb).all()

    # oracle: same preprocess + direct apply on the raw crops
    src = CachedHand100MSource(cache_dir)
    crops = src.gather_crops(np.arange(11))
    x = _preprocess_fn(32)(jnp.asarray(crops))
    want = np.asarray(forward(x)["embedding"])
    np.testing.assert_allclose(emb, want, rtol=1e-4, atol=1e-4)


def test_embed_cli_over_image_glob(encoder_export, tmp_path):
    """--images route: BGR files decoded to RGB, resized on device,
    batched with a ragged final chunk."""
    cv2 = pytest.importorskip("cv2")

    from simhand_tpu.serving.embed import main as embed_main

    forward, artifact = encoder_export
    rng = np.random.default_rng(7)
    for i in range(5):
        cv2.imwrite(str(tmp_path / f"crop_{i}.png"),
                    rng.integers(0, 255, (20, 20, 3), dtype=np.uint8))
    out = str(tmp_path / "emb.npy")
    embed_main(["--artifact", artifact, "--images",
                str(tmp_path / "crop_*.png"), "--batch", "2",
                "--what", "projection", "--out", out])
    emb = np.load(out)
    assert emb.shape == (5, 128) and np.isfinite(emb).all()
    # distinct inputs produce distinct projections (decode/resize ran)
    assert np.abs(emb[0] - emb[1]).max() > 1e-6


def test_microbatch_server_coalesces_requests(encoder_export):
    """simhand-serve: concurrent HTTP requests coalesce into one padded
    device batch; each caller gets its own row, equal to the direct
    forward on the same preprocessed crop."""
    import threading
    import urllib.request

    import jax.numpy as jnp

    from simhand_tpu.serving import load_artifact
    from simhand_tpu.serving.embed import _preprocess_fn
    from simhand_tpu.serving.server import MicroBatcher, make_handler

    forward, path = encoder_export
    call, meta = load_artifact(path)
    batcher = MicroBatcher(call, side=32, batch=8, max_wait_ms=200.0)
    from http.server import ThreadingHTTPServer

    httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(batcher))
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        rng = np.random.default_rng(0)
        imgs = [rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)
                for _ in range(4)]
        results: list = [None] * 4

        def post(i):
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/infer?h=32&w=32",
                data=imgs[i].tobytes(), method="POST")
            with urllib.request.urlopen(req, timeout=180) as resp:
                results[i] = json.loads(resp.read())

        threads = [threading.Thread(target=post, args=(i,))
                   for i in range(4)]
        for th in threads:
            th.start()
        for th in threads:
            th.join(timeout=240)

        # health endpoint
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/healthz", timeout=10) as r:
            assert r.read() == b"ok\n"

        # oracle: direct forward on the identically preprocessed batch,
        # padded to the server's batch size like the executor does
        crops = np.zeros((8, 32, 32, 3), np.uint8)
        crops[:4] = np.stack(imgs)
        want = np.asarray(forward(_preprocess_fn(32)(
            jnp.asarray(crops)))["embedding"])[:4]
        for i in range(4):
            assert results[i] is not None, f"request {i} failed"
            got = np.asarray(results[i]["embedding"], np.float32)
            np.testing.assert_allclose(got, want[i], rtol=1e-4, atol=1e-4)
    finally:
        httpd.shutdown()
        batcher.close()


def test_shard_over_devices_matches_single_device(encoder_export):
    """Single-process multi-chip serving: the artifact call jitted with
    the batch sharded over the 8-device ("data",) mesh — XLA's SPMD
    partitioner splits the inlined StableHLO. Rows match the unsharded
    call to f32 rounding (the partitioned program is a different
    compilation — fusion/tiling choices shift the last ulps; the forward
    itself has no cross-batch ops)."""
    import jax

    from simhand_tpu.serving import load_artifact, shard_over_devices

    forward, path = encoder_export
    call, _ = load_artifact(path)
    sharded, n_dev = shard_over_devices(call)
    assert n_dev == len(jax.devices()) == 8

    x = _images(16, 32, seed=11)
    out, ref = sharded(x), call(x)
    for key in ("embedding", "projection"):
        np.testing.assert_allclose(np.asarray(out[key]),
                                   np.asarray(ref[key]),
                                   rtol=1e-4, atol=1e-5)
    # the computation genuinely ran distributed, not replicated
    assert len(out["embedding"].sharding.device_set) == 8

    with pytest.raises(ValueError, match="not divisible"):
        sharded(_images(3, 32))


def test_embed_cli_sharded_devices(encoder_export, tmp_path):
    """--shard_devices drives all local devices from one process; output
    matches the single-device run to f32 rounding."""
    cv2 = pytest.importorskip("cv2")

    from simhand_tpu.serving.embed import main as embed_main

    _, artifact = encoder_export
    rng = np.random.default_rng(3)
    for i in range(11):
        cv2.imwrite(str(tmp_path / f"c_{i:02d}.png"),
                    rng.integers(0, 255, (32, 32, 3), dtype=np.uint8))
    glob_pat = str(tmp_path / "c_*.png")
    out1, out8 = str(tmp_path / "e1.npy"), str(tmp_path / "e8.npy")
    embed_main(["--artifact", artifact, "--images", glob_pat,
                "--batch", "8", "--out", out1])
    embed_main(["--artifact", artifact, "--images", glob_pat,
                "--batch", "8", "--shard_devices", "--out", out8])
    np.testing.assert_allclose(np.load(out1), np.load(out8),
                               rtol=1e-4, atol=1e-5)


def test_demo_serves_from_artifact(monkeypatch, tmp_path):
    """The demo loop runs off the deployed artifact alone — no model
    construction, no checkpoint (reference deployment: demo.py loads a
    .pth into a freshly built torch module every time)."""
    cv2 = pytest.importorskip("cv2")

    import simhand_tpu.finetune.mano as mano_mod
    from simhand_tpu.finetune.demo import main as demo_main
    from simhand_tpu.finetune.detnet import DetNet
    from simhand_tpu.serving import (build_detnet_forward, export_forward,
                                     save_artifact)
    from tests.test_mano import synthetic_mano

    model = DetNet(resnet_size="18", dtype=jnp.float32)
    variables = model.init(jax.random.key(0), jnp.zeros((1, 128, 128, 3)))
    forward = build_detnet_forward(variables, backbone="18",
                                   dtype=jnp.float32, side=128)
    exported = export_forward(forward, side=128, batch=1,
                              platforms=("cpu",))
    artifact = str(tmp_path / "detnet.shlo")
    save_artifact(artifact, exported, {"surface": "detnet",
                                       "backbone": "18", "side": 128})

    vid = str(tmp_path / "in.mp4")
    w = cv2.VideoWriter(vid, cv2.VideoWriter_fourcc(*"mp4v"), 10, (160, 120))
    rng = np.random.default_rng(0)
    for _ in range(3):
        w.write(rng.integers(0, 255, (120, 160, 3), dtype=np.uint8))
    w.release()

    monkeypatch.setattr(mano_mod, "ManoModel",
                        lambda path: synthetic_mano())
    out = str(tmp_path / "out.mp4")
    demo_main(["--video", vid, "--artifact", artifact, "--max_frames", "2",
               "--out", out, "--mano", "unused"])
    cap = cv2.VideoCapture(out)
    ok, frame = cap.read()
    cap.release()
    assert ok and frame.shape == (120, 240, 3)


@pytest.mark.slow
def test_export_cli_random_init(tmp_path):
    """The console entry exports a loadable artifact end to end."""
    out = tmp_path / "enc.shlo"
    res = subprocess.run(
        [sys.executable, "-m", "simhand_tpu.serving.export",
         "--surface", "encoder", "--backbone", "18", "--side", "32",
         "--batch", "2", "--dtype", "f32", "--platforms", "cpu",
         "--random_init", "--out", str(out)],
        capture_output=True, text=True, check=True,
        env={"PYTHONPATH": "", "JAX_PLATFORMS": "cpu",
             "PATH": "/usr/bin:/bin:/usr/local/bin",
             "HOME": "/root"},
        cwd="/root/repo",
    )
    info = json.loads(res.stdout.strip().splitlines()[-1])
    assert info["surface"] == "encoder" and info["platforms"] == ["cpu"]

    from simhand_tpu.serving import load_artifact

    call, meta = load_artifact(str(out))
    out_vals = call(_images(2, 32))
    assert np.isfinite(np.asarray(out_vals["embedding"])).all()
