import numpy as np
import pytest

from simhand_tpu.mining import mine_similar_hands, topk_similar
from simhand_tpu.mining.run import video_ids_from_annotations


def brute_force(kp, vids, k):
    N = kp.shape[0]
    d = np.linalg.norm(kp[:, None] - kp[None, :], axis=-1).mean(-1)
    d[vids[:, None] == vids[None, :]] = np.inf  # includes self
    idx = np.argsort(d, axis=1)[:, :k]
    return np.take_along_axis(d, idx, axis=1), idx


@pytest.mark.parametrize("k", [1, 3])
def test_topk_matches_brute_force(k):
    rng = np.random.default_rng(0)
    N = 64
    kp = rng.uniform(0, 1, size=(N, 21, 2)).astype(np.float32)
    vids = rng.integers(0, 6, size=N).astype(np.int32)
    want_d, want_i = brute_force(kp, vids, k)

    got_d, got_i = mine_similar_hands(kp, vids, k=k, query_chunk=16, db_chunk=16)
    np.testing.assert_allclose(got_d, want_d, rtol=1e-4, atol=1e-6)
    np.testing.assert_array_equal(got_i, want_i)


def test_topk_sharded_matches_brute_force():
    import jax
    from simhand_tpu.parallel import create_mesh

    rng = np.random.default_rng(1)
    N = 64
    kp = rng.uniform(0, 1, size=(N, 21, 2)).astype(np.float32)
    vids = rng.integers(0, 8, size=N).astype(np.int32)
    want_d, want_i = brute_force(kp, vids, 2)

    mesh = create_mesh()
    got_d, got_i = mine_similar_hands(
        kp, vids, k=2, query_chunk=4, db_chunk=16, mesh=mesh
    )
    np.testing.assert_allclose(got_d, want_d, rtol=1e-4, atol=1e-6)
    np.testing.assert_array_equal(got_i, want_i)


@pytest.mark.parametrize("n", [64, 77])  # divisible and ragged corpus sizes
def test_ring_sharded_db_matches_brute_force(n):
    """shard_db=True: the DB rotates around the mesh ring (ppermute);
    results must equal the replicated-DB path and the brute force oracle,
    including when N divides into neither the query nor the db tiling."""
    from simhand_tpu.parallel import create_mesh

    rng = np.random.default_rng(3)
    kp = rng.uniform(0, 1, size=(n, 21, 2)).astype(np.float32)
    vids = rng.integers(0, 8, size=n).astype(np.int32)
    want_d, want_i = brute_force(kp, vids, 2)

    mesh = create_mesh()
    got_d, got_i = mine_similar_hands(
        kp, vids, k=2, query_chunk=4, db_chunk=8, mesh=mesh, shard_db=True
    )
    np.testing.assert_allclose(got_d, want_d, rtol=1e-4, atol=1e-6)
    np.testing.assert_array_equal(got_i, want_i)


def test_excludes_same_video_and_self():
    rng = np.random.default_rng(2)
    N = 32
    kp = rng.uniform(0, 1, size=(N, 21, 2)).astype(np.float32)
    vids = (np.arange(N) // 8).astype(np.int32)  # 4 videos
    d, i = mine_similar_hands(kp, vids, k=1, query_chunk=8, db_chunk=8)
    for q in range(N):
        assert i[q, 0] != q
        assert vids[i[q, 0]] != vids[q]


def test_video_ids_from_paths():
    images = [
        {"id": 0, "file_name": "frames/vidA/frame_000000.jpg"},
        {"id": 1, "file_name": "frames/vidA/frame_000030.jpg"},
        {"id": 2, "file_name": "frames/vidB/frame_000000.jpg"},
    ]
    annotations = [{"image_id": 0}, {"image_id": 1}, {"image_id": 2}]
    vids = video_ids_from_annotations(images, annotations)
    assert vids[0] == vids[1] != vids[2]


def test_mining_cli_end_to_end(tmp_path):
    """Unpaired annotations -> mining CLI -> schema-exact paired JSON that
    reproduces the synthetic generator's brute-force pairs."""
    import json

    from simhand_tpu.data.sources import generate_synthetic_hand100m
    from simhand_tpu.mining import run as mining_run

    root = str(tmp_path / "h100m")
    anno_path = generate_synthetic_hand100m(
        root, num_images=32, num_videos=4, side=64, scale="smoke"
    )
    with open(anno_path) as f:
        data = json.load(f)
    want = [a["positive_sample"][0] for a in data["annotations"]]

    # strip the pairs, re-mine them through the CLI
    for a in data["annotations"]:
        a["positive_sample"] = []
        a["distance"] = []
    unpaired = str(tmp_path / "unpaired.json")
    with open(unpaired, "w") as f:
        json.dump(data, f)
    out = str(tmp_path / "paired.json")
    mining_run.main(["--input", unpaired, "--output", out,
                     "--k", "1", "--query_chunk", "8", "--db_chunk", "16"])

    with open(out) as f:
        mined = json.load(f)
    got = [a["positive_sample"][0] for a in mined["annotations"]]
    assert got == want
    # distances present and finite
    assert all(np.isfinite(a["distance"][0]) for a in mined["annotations"])


def test_topk_handles_non_divisible_sizes():
    rng = np.random.default_rng(7)
    N = 57  # not divisible by chunks — exercises padding paths
    kp = rng.uniform(0, 1, size=(N, 21, 2)).astype(np.float32)
    vids = rng.integers(0, 5, size=N).astype(np.int32)
    want_d, want_i = brute_force(kp, vids, 2)
    got_d, got_i = mine_similar_hands(kp, vids, k=2, query_chunk=10, db_chunk=16)
    np.testing.assert_array_equal(got_i, want_i)
    np.testing.assert_allclose(got_d, want_d, rtol=1e-4, atol=1e-6)


def test_single_program_mining_matches_chunked():
    rng = np.random.default_rng(9)
    N = 48
    kp = rng.uniform(0, 1, size=(N, 21, 2)).astype(np.float32)
    vids = rng.integers(0, 6, size=N).astype(np.int32)
    want_d, want_i = brute_force(kp, vids, 1)
    got_d, got_i = mine_similar_hands(
        kp, vids, k=1, query_chunk=16, db_chunk=16, single_program=True
    )
    np.testing.assert_array_equal(got_i, want_i)
    np.testing.assert_allclose(got_d, want_d, rtol=1e-4)


def test_sharded_single_program_and_chunked_modes_match():
    """Both mesh modes — the fused one-program path (default) and the
    per-chunk dispatch path — match brute force, incl. padding."""
    from simhand_tpu.parallel import create_mesh

    rng = np.random.default_rng(11)
    N = 57  # not divisible by query_chunk * n_devices
    kp = rng.uniform(0, 1, size=(N, 21, 2)).astype(np.float32)
    vids = rng.integers(0, 6, size=N).astype(np.int32)
    want_d, want_i = brute_force(kp, vids, 2)
    mesh = create_mesh()
    for single in (True, False):
        got_d, got_i = mine_similar_hands(
            kp, vids, k=2, query_chunk=4, db_chunk=16, mesh=mesh,
            single_program=single,
        )
        np.testing.assert_array_equal(got_i, want_i)
        np.testing.assert_allclose(got_d, want_d, rtol=1e-4, atol=1e-6)
