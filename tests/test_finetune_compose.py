"""Multi-dataset composition + eval CLI (VERDICT round-1 items 1/4)."""
import json

import numpy as np
import pytest


def test_concat_dataset_index_routing():
    from simhand_tpu.finetune.datasets import ConcatDataset, SyntheticPoseDataset

    a = SyntheticPoseDataset(n=5, seed=0)
    b = SyntheticPoseDataset(n=3, seed=1)
    ds = ConcatDataset([a, b])
    assert len(ds) == 8
    np.testing.assert_array_equal(ds[0]["image"], a[0]["image"])
    np.testing.assert_array_equal(ds[4]["image"], a[4]["image"])
    np.testing.assert_array_equal(ds[5]["image"], b[0]["image"])
    np.testing.assert_array_equal(ds[7]["image"], b[2]["image"])
    with pytest.raises(IndexError):
        ds[8]


def test_weighted_mix_deterministic_and_weighted():
    from simhand_tpu.finetune.datasets import (
        SyntheticPoseDataset,
        WeightedMixDataset,
    )

    a = SyntheticPoseDataset(n=4, seed=0, side=32)
    b = SyntheticPoseDataset(n=4, seed=1, side=64)  # distinguishable by side
    ds = WeightedMixDataset([a, b], weights=[0.9, 0.1], epoch_size=200,
                            seed=7)
    assert len(ds) == 200
    # deterministic: same index -> same sample
    np.testing.assert_array_equal(ds[13]["image"], ds[13]["image"])
    again = WeightedMixDataset([a, b], weights=[0.9, 0.1], epoch_size=200,
                               seed=7)
    np.testing.assert_array_equal(ds[13]["image"], again[13]["image"])
    # weights respected (binomial: 180 +- ~13)
    from_a = sum(ds[i]["image"].shape[0] == 32 for i in range(200))
    assert 150 <= from_a <= 200
    # default weights proportional to lengths
    even = WeightedMixDataset([a, b], epoch_size=100, seed=0)
    np.testing.assert_allclose(even.weights, [0.5, 0.5])

    # the multiset must be redrawn per epoch (set_epoch), or samples
    # outside epoch 0's draw would never be trained on
    e0 = [ds[i]["image"].tobytes() for i in range(20)]
    ds.set_epoch(1)
    e1 = [ds[i]["image"].tobytes() for i in range(20)]
    assert e0 != e1
    ds.set_epoch(0)
    assert [ds[i]["image"].tobytes() for i in range(20)] == e0


def test_batch_iterator_epoch_and_tail():
    """detnet_batch_iterator drives set_epoch on the mix dataset and,
    with drop_remainder=False (eval), yields the final partial batch."""
    from simhand_tpu.finetune.datasets import (
        DetnetSampleBuilder,
        SyntheticPoseDataset,
        WeightedMixDataset,
        detnet_batch_iterator,
    )

    a = SyntheticPoseDataset(n=6, seed=0, side=32)
    ds = WeightedMixDataset([a], epoch_size=10, seed=3)
    builder = DetnetSampleBuilder(train=False)

    def epoch_images(epoch, **kw):
        return [
            b["img"] for b in detnet_batch_iterator(
                ds, builder, 4, epoch=epoch, shuffle=False, **kw)
        ]

    tail = epoch_images(0, drop_remainder=False)
    assert [b.shape[0] for b in tail] == [4, 4, 2]   # 10 = 4+4+2
    dropped = epoch_images(0)
    assert [b.shape[0] for b in dropped] == [4, 4]
    # different epoch -> different mix draw, same epoch -> identical
    assert not np.array_equal(np.concatenate(dropped),
                              np.concatenate(epoch_images(1)))
    np.testing.assert_array_equal(np.concatenate(dropped),
                                  np.concatenate(epoch_images(0)))


def test_build_composed_dataset_parsing():
    from simhand_tpu.finetune.datasets import ConcatDataset, WeightedMixDataset
    from simhand_tpu.finetune.registry import build_composed_dataset

    one = build_composed_dataset("synthetic", None, synthetic_n=8)
    assert len(one) == 8
    cat = build_composed_dataset("synthetic,synthetic", None, synthetic_n=8)
    assert isinstance(cat, ConcatDataset) and len(cat) == 16
    mix = build_composed_dataset("synthetic,synthetic", None,
                                 weights=[1.0, 3.0], epoch_size=12,
                                 synthetic_n=8)
    assert isinstance(mix, WeightedMixDataset) and len(mix) == 12
    with pytest.raises(KeyError):
        build_composed_dataset("synthetic,nosuch", None)


def test_mixed_2d_3d_batches_train():
    """A 3D set concatenated with a 2D set yields stackable batches and the
    loss gates 3D terms per-sample."""
    from simhand_tpu.finetune.datasets import (
        ConcatDataset,
        DetnetSampleBuilder,
        SyntheticPoseDataset,
        detnet_batch_iterator,
    )

    class TwoD(SyntheticPoseDataset):
        def __getitem__(self, i):
            s = super().__getitem__(i)
            return {"image": s["image"], "K": None, "joint": None,
                    "kp2d": s["kp2d"]}

    ds = ConcatDataset([SyntheticPoseDataset(n=4), TwoD(n=4)])
    builder = DetnetSampleBuilder(train=True)
    batches = list(detnet_batch_iterator(ds, builder, 8, shuffle=True))
    assert len(batches) == 1
    b = batches[0]
    assert "joint" not in b          # ragged -> metric joints dropped
    flags = b["flag_3d"]
    assert 0.0 < flags.mean() < 1.0  # genuinely mixed batch
    assert b["hm"].shape == (8, 32, 32, 21)


def test_global_align_reference_semantics():
    from simhand_tpu.finetune.evaluation import global_align

    rng = np.random.default_rng(0)
    gt = rng.normal(size=(4, 21, 3))
    # prediction = gt shifted + scaled: alignment must recover gt exactly
    pred = 2.5 * gt + rng.normal(size=(4, 1, 3))
    gt_out, aligned = global_align(gt, pred, "stb")
    np.testing.assert_allclose(aligned, gt, atol=1e-9)

    # tip-only: masked centroid/scale alignment, <2 valid tips dropped
    tips_gt = np.full((3, 5, 3), np.nan)
    tips_gt[0] = rng.normal(size=(5, 3))
    tips_gt[1, :1] = rng.normal(size=(1, 3))     # only 1 valid -> dropped
    pred21 = rng.normal(size=(3, 21, 3))
    fh_tips = pred21[:, [4, 8, 12, 16, 20]]
    # make sample 0's prediction a shifted/scaled copy of gt
    pred21[0, [4, 8, 12, 16, 20]] = 0.5 * tips_gt[0] + 1.0
    g, p, counts = global_align(tips_gt, pred21, "do")
    assert counts == [5]
    np.testing.assert_allclose(p, tips_gt[0], atol=1e-9)


def test_eval_cli_synthetic_and_tip_only(tmp_path):
    """The eval CLI runs a registry dataset end-to-end and emits JSON."""
    cv2 = pytest.importorskip("cv2")

    from simhand_tpu.finetune.evaluate import main as eval_main

    m = eval_main([
        "--dataset", "synthetic", "--backbone", "18",
        "--batch_size", "8", "--max_batches", "1",
        "--out_json", str(tmp_path / "m.json"),
    ])
    assert {"epe_mm_mean", "auc_20_50mm", "epe_norm_mean"} <= set(m)
    assert json.load(open(tmp_path / "m.json"))["dataset"] == "synthetic"

    # tip-only 2D protocol over a DexterObject fixture
    rng = np.random.default_rng(1)
    tips = rng.uniform(30, 200, (5, 2)).astype(np.float32)
    line = ",".join(f"{v:.2f}" for v in tips.reshape(-1))
    d = tmp_path / "do" / "data" / "Grasp1"
    (d / "annotations").mkdir(parents=True)
    (d / "color").mkdir()
    (d / "annotations" / "Grasp1.txt").write_text((line + "\n") * 8)
    for i in range(8):
        cv2.imwrite(str(d / "color" / f"color_{i:05d}.png"),
                    rng.integers(0, 255, (240, 320, 3), dtype=np.uint8))
    m = eval_main([
        "--dataset", "do", "--data_dir", str(tmp_path / "do"),
        "--backbone", "18", "--batch_size", "8", "--max_batches", "1",
    ])
    assert {"epe_px_mean", "pck@8px", "pck@16px"} <= set(m)
    assert "epe_mm_mean" not in m    # 2D-only fixture: no 3D protocol

    # with the official 3D tip files, the reference's masked-tip 3D
    # metric (mm EPE + AUC 20-50mm after centroid/scale alignment,
    # align.py:27-57) is ALSO reported
    rng2 = np.random.default_rng(9)
    d3 = tmp_path / "do3" / "data" / "Grasp1"
    (d3 / "annotations").mkdir(parents=True)
    (d3 / "color").mkdir()
    t3 = np.zeros((8, 5, 3), np.float32)
    t3[..., :2] = rng2.uniform(-60, 60, (8, 5, 2))
    t3[..., 2] = rng2.uniform(400, 700, (8, 5))
    (d3 / "annotations" / "my_Grasp13D.txt").write_text("\n".join(
        "; ".join(", ".join(f"{v:.3f}" for v in tip) for tip in row)
        for row in t3))
    for i in range(8):
        cv2.imwrite(str(d3 / "color" / f"color_{i:05d}.png"),
                    rng2.integers(0, 255, (480, 640, 3), dtype=np.uint8))
    m3 = eval_main([
        "--dataset", "do", "--data_dir", str(tmp_path / "do3"),
        "--backbone", "18", "--batch_size", "8", "--max_batches", "1",
    ])
    assert {"epe_px_mean", "epe_mm_mean", "auc_20_50mm"} <= set(m3)
    assert np.isfinite(m3["epe_mm_mean"])


@pytest.mark.slow
def test_train_cli_multiset_weighted(tmp_path):
    """--dataset a,b --sample_weights trains through the composed mix."""
    from simhand_tpu.finetune.train import main as train_main

    state = train_main([
        "--dataset", "synthetic,synthetic", "--backbone", "18",
        "--sample_weights", "0.7,0.3", "--epoch_size", "16",
        "--epochs", "1", "--batch_size", "8", "--max_steps", "1",
        "--eval_every", "5", "--out_dir", str(tmp_path / "out"),
    ])
    assert state is not None
    assert (tmp_path / "out" / "checkpoints").exists()

    # npy training-curve artifacts (the reference plot.py contract:
    # [epoch, value] loss rows + per-dataset AUC/ACC_HM dicts)
    import numpy as np

    for name in ("lossH", "lossD", "lossL"):
        arr = np.load(tmp_path / "out" / f"{name}.npy")
        assert arr.shape == (1, 2) and arr[0, 0] == 1
    acc = np.load(tmp_path / "out" / "acc_hm_all.npy",
                  allow_pickle=True).item()
    assert "synthetic" in acc and len(acc["synthetic"]) == 1

    from simhand_tpu.finetune.plot import main as plot_main

    fig = plot_main(["-p", str(tmp_path / "out")])
    assert (tmp_path / "out" / "vis_train.png").exists() and fig


def test_photometric_augment_semantics():
    """blur + shuffled color jitter: deterministic per-rng, train-only,
    identity-ish at the distribution centers."""
    cv2 = pytest.importorskip("cv2")

    from simhand_tpu.finetune.datasets import (
        DetnetSampleBuilder,
        SyntheticPoseDataset,
        photometric_augment,
    )

    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)

    a = photometric_augment(img, np.random.default_rng(5))
    b = photometric_augment(img, np.random.default_rng(5))
    np.testing.assert_array_equal(a, b)           # deterministic
    c = photometric_augment(img, np.random.default_rng(6))
    assert (a != c).any()                          # rng-dependent
    assert a.dtype == np.uint8 and a.shape == img.shape
    # zero-strength jitter = blur-only pipeline stays close to the input
    d = photometric_augment(img, np.random.default_rng(7), brightness=0,
                            contrast=0, saturation=0, hue=0, blur_radius=0)
    np.testing.assert_array_equal(d, img)

    # eval builder never jitters; train builder does
    ds = SyntheticPoseDataset(n=2, side=64)
    val = DetnetSampleBuilder(train=False)
    o1 = val(ds[0], np.random.default_rng(1))
    o2 = val(ds[0], np.random.default_rng(2))
    np.testing.assert_array_equal(o1["img"], o2["img"])


@pytest.mark.slow
def test_train_cli_dlr_differential_rates(tmp_path):
    """--lr_strategy DLR (reference utils/optimizer.py param groups):
    encoder and heads get separate rates. With encoder lr 0 the encoder
    stays at init while the heads move."""
    import jax
    import jax.numpy as jnp

    from simhand_tpu.finetune.detnet import DetNet
    from simhand_tpu.finetune.train import main as train_main

    state = train_main([
        "--dataset", "synthetic", "--backbone", "18",
        "--epochs", "1", "--batch_size", "8", "--max_steps", "1",
        "--eval_every", "5", "--out_dir", str(tmp_path / "out"),
        "--lr_strategy", "DLR", "--lr", "0.0", "--lr_head", "1e-3",
    ])
    init = DetNet(resnet_size="18", dtype=jnp.bfloat16).init(
        jax.random.key(0), jnp.zeros((1, 128, 128, 3))
    )["params"]
    enc_same = jax.tree.map(
        lambda a, b: bool(np.array_equal(np.asarray(a), np.asarray(b))),
        state.params["encoder"], init["encoder"],
    )
    assert all(jax.tree.leaves(enc_same))
    head_keys = [k for k in state.params if k != "encoder"]
    moved = any(
        not np.array_equal(np.asarray(a), np.asarray(b))
        for k in head_keys
        for a, b in zip(jax.tree.leaves(state.params[k]),
                        jax.tree.leaves(init[k]))
    )
    assert moved


def test_eval_cli_rhd_official_layout(tmp_path):
    """finetune.evaluate --dataset rhd runs end-to-end over the OFFICIAL
    RHD_published_v2 pickle layout (per-frame dicts), exercising side
    selection, rhd->snap reorder, mirror, and mask-based crop scale
    through the full eval pipeline."""
    import pickle

    cv2 = pytest.importorskip("cv2")

    from simhand_tpu.finetune.evaluate import main as eval_main

    root = tmp_path / "rhd"
    (root / "evaluation" / "color").mkdir(parents=True)
    (root / "evaluation" / "mask").mkdir()
    rng = np.random.default_rng(7)
    anno = {}
    K = np.array([[280.0, 0, 160], [0, 280.0, 160], [0, 0, 1]], np.float32)
    for i in range(8):
        cv2.imwrite(str(root / "evaluation" / "color" / f"{i:05d}.png"),
                    rng.integers(0, 255, (320, 320, 3), dtype=np.uint8))
        mask = np.zeros((320, 320), np.uint8)
        mask[100:220, 80:240] = 25       # right-hand segment
        cv2.imwrite(str(root / "evaluation" / "mask" / f"{i:05d}.png"), mask)
        xyz = np.zeros((42, 3), np.float32)
        # right hand ~0.5 m deep, small spread -> projects in-image
        xyz[21:] = rng.uniform(-0.04, 0.04, (21, 3)) + [0, 0, 0.5]
        uvw = xyz[21:] @ K.T
        uv_vis = np.zeros((42, 3), np.float32)
        uv_vis[21:, :2] = uvw[:, :2] / uvw[:, 2:]
        uv_vis[21:, 2] = 1.0
        anno[i] = {"uv_vis": uv_vis, "xyz": xyz, "K": K}
    with open(root / "evaluation" / "anno_evaluation.pickle", "wb") as f:
        pickle.dump(anno, f)

    m = eval_main([
        "--dataset", "rhd", "--data_dir", str(root), "--split", "test",
        "--backbone", "18", "--batch_size", "8", "--max_batches", "1",
    ])
    assert {"epe_mm_mean", "auc_20_50mm"} <= set(m)
    assert np.isfinite(m["epe_mm_mean"])
