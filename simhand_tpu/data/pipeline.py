"""Pre-training sample preparation and batching.

``PretrainDataset`` routes each index through the experiment-type-specific
prep (reference: src/data_loader/data_set.py:96-157), producing the batch
dict consumed by the train step:

  transformed_image{1,2} : float32 (H, W, 3), ImageNet-normalized
  joints{1,2}_ori        : raw normalized keypoints x resize_shape
  joints{1,2}_aug        : post-augmentation 2.5D joints
  angle_{1,2}, jitter_{x,y}_{1,2} : per-view augment params

Design split vs the reference:
  * host side (this module): decode + crop + the cv2-exact augmentation
    chain (parity path), or decode + crop only (device path, where
    simhand_tpu.data.augment applies the fused augmentations on-TPU);
  * the "_w" prep quirk where simclr/peclr preps scale the *anchor's*
    joints twice in place (data_set.py:471-477,541-547) is NOT
    reproduced — joints{1,2}_ori are the correct per-view raw joints, as
    the simhand_w prep (:659-665) does.

Loading is via a simple prefetching thread-pool loader (host work is
pure numpy/cv2 and releases the GIL inside OpenCV), keeping the framework
free of torch in the input path.
"""
from __future__ import annotations

import queue
import threading
from typing import Iterator, Sequence

import numpy as np

from simhand_tpu.data.augment_cv2 import (
    AppliedParams,
    AugmentFlags,
    AugmentParams,
    HostAugmenter,
)

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)

SIMILAR_PAIR_TYPES = {"simhand-base", "simhand", "simhand_w", "simhand_vis"}
WEIGHTED_TYPES = {"simclr_w", "peclr_w", "simhand_w", "simhand_vis"}
PARAM_TYPES = {"peclr", "peclr_w", "simhand-base", "simhand", "simhand_w", "simhand_vis"}


def normalize_image(img_uint8: np.ndarray) -> np.ndarray:
    """uint8 RGB -> float32 CHW-free (H, W, 3), ImageNet stats."""
    x = img_uint8.astype(np.float32) / 255.0
    return (x - IMAGENET_MEAN) / IMAGENET_STD


def convert_to_2_5d_np(K: np.ndarray, joints_3d: np.ndarray) -> np.ndarray:
    """Numpy twin of core.geometry.convert_to_2_5d for the host loader's
    hot path (no per-sample jax dispatch); accepts single (21, 3) or
    batched (..., 21, 3) joints with a shared or per-sample K. Every
    reference prep projects camera-space joints to 2.5D pixel coords
    before augmenting (data_set.py: convert_to_2_5D(sample['K'],
    sample['joints3D'])) — for the Hand100M sources (K=I, depth 1.0)
    this is an x/y no-op with z_rel=0, but for freihand/youtube it is
    what makes the crop geometry see pixels instead of meters."""
    from simhand_tpu.core.geometry import CHILD_JOINT, PARENT_JOINT

    j = np.asarray(joints_3d, np.float64)
    K = np.asarray(K, np.float64)
    scale = np.linalg.norm(
        j[..., CHILD_JOINT, :] - j[..., PARENT_JOINT, :], axis=-1
    )
    proj = np.einsum("...ij,...kj->...ki", K, j) / j[..., -1:]
    z_rel = (j[..., -1] - j[..., PARENT_JOINT, -1][..., None]
             ) / scale[..., None]
    return np.concatenate(
        [proj[..., :2], z_rel[..., None]], axis=-1
    ).astype(np.float32)


class PretrainDataset:
    """Index-addressable prepared samples for any experiment type."""

    def __init__(
        self,
        source,
        experiment_type: str,
        flags: AugmentFlags,
        params: AugmentParams,
        seed: int = 0,
        use_palm: bool = False,
    ):
        self.source = source
        self.experiment_type = experiment_type
        self.augmenter = HostAugmenter(flags, params)
        self.flags = flags
        self.params = params
        self.seed = seed
        # supervised route only: regress the palm (midpoint of wrist and
        # index_mcp, ait order) instead of the wrist — reference
        # data_set.py:388-396 / --use_palm
        self.use_palm = use_palm

    def __len__(self) -> int:
        return len(self.source)

    def _rng(self, idx: int, epoch: int = 0) -> np.random.Generator:
        return np.random.default_rng(
            np.random.SeedSequence([self.seed, epoch, idx])
        )

    def _prep_view(self, sample: dict, rng, override_jitter):
        img, j_aug, _, applied = self.augmenter.transform(
            sample["image"],
            convert_to_2_5d_np(sample["K"], sample["joints3D"]),
            rng,
            override_angle=None,
            override_jitter=override_jitter,
        )
        return normalize_image(img), j_aug, applied

    def _ori_joints(self, sample: dict) -> np.ndarray:
        j = sample["joints_raw"].copy()
        j[:, 0] *= self.params.resize_shape[1]
        j[:, 1] *= self.params.resize_shape[0]
        return j

    @staticmethod
    def _param_dict(applied: AppliedParams, view: int) -> dict:
        out = {}
        for key in ("angle", "jitter_x", "jitter_y", "h", "s", "a", "b"):
            v = getattr(applied, key)
            if v is not None:
                out[f"{key}_{view}"] = np.float32(v)
        return out

    def _supervised(self, sample: dict, rng) -> dict:
        """Supervised 2.5D sample (reference: data_set.py:360-411):
        convert to 2.5D, augment image+joints, update K by the accumulated
        transform, recreate 3D for a consistency reference."""
        from simhand_tpu.core import geometry
        import jax.numpy as jnp

        K = np.asarray(sample["K"], np.float32)
        j25, scale = geometry.convert_to_2_5d(
            jnp.asarray(K), jnp.asarray(sample["joints3D"])
        )
        j25 = np.asarray(j25)
        img, j25_aug, T, _ = self.augmenter.transform(
            sample["image"], j25, rng
        )
        K_new = T.astype(np.float32) @ K
        joints3d = np.asarray(sample["joints3D"], np.float32)
        joints_raw = np.asarray(sample["joints_raw"], np.float32)
        if self.use_palm:
            # reference order (data_set.py:384-396): palm-ify the 3D
            # joints AFTER the augment, recompute 2.5D through the
            # updated K (replacing the augmented 2.5D — K_new carries the
            # transform), and palm-ify joints_raw too
            def palm(j):
                j = j.copy()
                j[0] = (j[0] + j[2]) / 2.0      # ait wrist=0, index_mcp=2
                return j

            joints3d = palm(joints3d)
            joints_raw = palm(joints_raw)
            j25_aug_j, scale = geometry.convert_to_2_5d(
                jnp.asarray(K_new), jnp.asarray(joints3d)
            )
            j25_aug = np.asarray(j25_aug_j)
        j3d_recreated = np.asarray(
            geometry.convert_2_5d_to_3d(
                jnp.asarray(j25_aug), scale, jnp.asarray(K_new)
            )
        )
        return {
            "image": normalize_image(img),
            "joints": j25_aug.astype(np.float32),
            "joints3D": joints3d,
            "K": K_new,
            "scale": np.float32(scale),
            "joints3D_recreated": j3d_recreated.astype(np.float32),
            "joints_valid": np.asarray(sample["joints_valid"], np.float32),
            "joints_raw": joints_raw,
            "T": T.astype(np.float32),
        }

    def raw_batch(self, indices) -> dict | None:
        """Vectorized raw-pair batch straight off a packed cache source
        (uses the native multithreaded gather; no per-sample Python).
        Returns None when the source doesn't support it."""
        src = self.source
        if not hasattr(src, "gather_crops"):
            return None
        idx = np.asarray(indices, np.int64)
        if self.experiment_type in SIMILAR_PAIR_TYPES:
            pos = src.positive_idx[idx]
        else:
            pos = idx

        def to_25d(j):
            # batched conversion with identity K (cache sources are
            # Hand100M crops: pixel x/y, pseudo-depth) — matches raw_pair
            return convert_to_2_5d_np(np.eye(3), j)

        return {
            "image1": src.gather_crops(idx),
            "image2": src.gather_crops(pos),
            "joints1": to_25d(src.joints3d[idx]),
            "joints2": to_25d(src.joints3d[pos]),
            "joints_raw1": src.joints_raw[idx],
            "joints_raw2": src.joints_raw[pos],
        }

    def raw_pair(self, idx: int) -> dict:
        """Device-augmentation path: undecoded work only — both views'
        uint8 crops + pixel joints + normalized raw joints. Augmentation
        happens inside the train step (data.augment.prepare_views)."""
        anchor = self.source[idx]
        if self.experiment_type in SIMILAR_PAIR_TYPES:
            positive = self.source[int(anchor["positive_sample_idx"])]
        else:
            positive = anchor
        return {
            "image1": anchor["image"],
            "image2": positive["image"],
            "joints1": convert_to_2_5d_np(anchor["K"], anchor["joints3D"]),
            "joints2": convert_to_2_5d_np(positive["K"],
                                          positive["joints3D"]),
            "joints_raw1": anchor["joints_raw"].astype(np.float32),
            "joints_raw2": positive["joints_raw"].astype(np.float32),
        }

    def __getitem__(self, idx: int, epoch: int = 0) -> dict:
        rng = self._rng(idx, epoch)
        etype = self.experiment_type
        anchor = self.source[idx]

        if etype == "supervised":
            return self._supervised(anchor, rng)

        if etype in SIMILAR_PAIR_TYPES:
            positive = self.source[int(anchor["positive_sample_idx"])]
        else:
            positive = anchor

        override_jitter = None if self.flags.crop else [0, 0]

        img1, j1_aug, p1 = self._prep_view(anchor, rng, override_jitter)
        img2, j2_aug, p2 = self._prep_view(positive, rng, override_jitter)

        out = {"transformed_image1": img1, "transformed_image2": img2}
        if etype in WEIGHTED_TYPES:
            out["joints1_ori"] = self._ori_joints(anchor)
            out["joints2_ori"] = self._ori_joints(positive)
            out["joints1_aug"] = j1_aug.astype(np.float32)
            out["joints2_aug"] = j2_aug.astype(np.float32)
        if etype == "simhand_vis":
            # companion views through the reference's DefaultSampleAugmenter
            # semantics (data_set.py:741-788 + sample_augmenter_default.py:
            # 501-516): every flag forced off except resize; never rotated;
            # cropped (with the zero-jitter override) ONLY when the main
            # crop flag is off — the override is what triggers the crop
            # step. joints{1,2}_ori for vis are THESE transforms' joint
            # outputs, not the raw-scaled joints of the other _w preps.
            geo = HostAugmenter(
                AugmentFlags(crop=False, resize=self.flags.resize,
                             rotate=False),
                self.params,
            )
            v1, jo1, _, _ = geo.transform(
                anchor["image"],
                convert_to_2_5d_np(anchor["K"], anchor["joints3D"]), rng,
                override_jitter=override_jitter,
            )
            v2, jo2, _, _ = geo.transform(
                positive["image"],
                convert_to_2_5d_np(positive["K"], positive["joints3D"]),
                rng,
                override_jitter=override_jitter,
            )
            out["image1"] = normalize_image(v1)
            out["image2"] = normalize_image(v2)
            out["joints1_ori"] = jo1.astype(np.float32)
            out["joints2_ori"] = jo2.astype(np.float32)
        if etype in PARAM_TYPES:
            out.update(self._param_dict(p1, 1))
            out.update(self._param_dict(p2, 2))
        return out


def _collate(samples: Sequence[dict]) -> dict:
    keys = samples[0].keys()
    return {k: np.stack([s[k] for s in samples]) for k in keys}


def batch_iterator(
    dataset: PretrainDataset,
    batch_size: int,
    shuffle: bool = True,
    seed: int = 0,
    epoch: int = 0,
    num_threads: int = 8,
    drop_last: bool = True,
    raw: bool = False,
    sample_weights: np.ndarray | None = None,
) -> Iterator[dict]:
    """Prefetching threaded batch loader.

    cv2 releases the GIL in its hot loops, so a thread pool gets close to
    process-pool throughput without pickling overhead. With
    ``sample_weights``, indices are drawn with replacement (the
    reference's WeightedRandomSampler semantics for multi-source concats).
    """
    n = len(dataset)
    rng_order = np.random.default_rng([seed, epoch])
    if sample_weights is not None:
        order = rng_order.choice(n, size=n, replace=True, p=sample_weights)
    else:
        order = np.arange(n)
        if shuffle:
            rng_order.shuffle(order)
    nb = n // batch_size if drop_last else -(-n // batch_size)

    if raw:
        # raw batches are assembled by the natively-parallel sharded
        # gather (OpenMP across all cores); stacking many iterator
        # threads on top oversubscribes and COLLAPSES throughput
        # (measured: 8,455 samples/s at 2 threads vs 648 at 16).
        num_threads = min(num_threads, 2)
    n_workers = min(num_threads, nb) or 1
    # Backpressure: work indices are issued in a bounded window ahead of
    # the consumer, so at most ~window prepared batches ever sit in
    # `done` — an unbounded buffer would let workers prefetch the whole
    # epoch (tens of GB at global-batch scale) while the first train
    # step spends minutes compiling.
    window = 2 * n_workers
    work: "queue.Queue[int | None]" = queue.Queue()
    done: dict[int, dict] = {}
    errors: list[BaseException] = []
    done_lock = threading.Condition()
    stop = threading.Event()

    def worker():
        while not stop.is_set():
            b = work.get()
            if b is None or stop.is_set():
                return
            try:
                idxs = order[b * batch_size : (b + 1) * batch_size]
                if raw:
                    batch = dataset.raw_batch(idxs)
                    if batch is None:
                        batch = _collate(
                            [dataset.raw_pair(int(i)) for i in idxs]
                        )
                else:
                    batch = _collate(
                        [dataset.__getitem__(int(i), epoch) for i in idxs]
                    )
            except BaseException as e:  # propagate, don't deadlock
                with done_lock:
                    errors.append(e)
                    done_lock.notify_all()
                return
            with done_lock:
                done[b] = batch
                done_lock.notify_all()

    threads = [
        threading.Thread(target=worker, daemon=True) for _ in range(n_workers)
    ]
    for t in threads:
        t.start()
    issued = min(nb, window)
    for b in range(issued):
        work.put(b)

    try:
        for b in range(nb):
            with done_lock:
                while b not in done:
                    if errors:
                        raise errors[0]
                    done_lock.wait()
                batch = done.pop(b)
            if issued < nb:
                work.put(issued)
                issued += 1
            yield batch
        with done_lock:
            if errors:
                raise errors[0]
    finally:
        # An abandoned generator (e.g. --max_steps breaking mid-epoch)
        # must not leave workers running inside cv2 C++ code when the
        # interpreter exits — that aborts with "terminate called without
        # an active exception". Drain, send exit sentinels, and join.
        stop.set()
        try:
            while True:
                work.get_nowait()
        except queue.Empty:
            pass
        for _ in threads:
            work.put(None)
        for t in threads:
            t.join(timeout=10)
