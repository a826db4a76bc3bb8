"""grain-based multiprocess input pipeline (production loader).

The threaded loader in data/pipeline.py is enough for cached crops (pure
memcpy); for the cv2-exact host-augmentation path at global batch 8192 the
per-sample work is CPU-bound, so this adapter runs PretrainDataset through
``grain.python.DataLoader`` with worker *processes* (the JAX-native
equivalent of the reference's num_workers=24 torch DataLoader,
src/experiments/main.py:100), sharded per host for multi-process TPU
topologies.
"""
from __future__ import annotations

from typing import Iterator

import numpy as np


class _DatasetAdapter:
    """grain RandomAccessDataSource over PretrainDataset (picklable)."""

    def __init__(self, dataset, epoch: int, raw: bool):
        self._dataset = dataset
        self._epoch = epoch
        self._raw = raw

    def __len__(self) -> int:
        return len(self._dataset)

    def __getitem__(self, idx: int) -> dict:
        if self._raw:
            return self._dataset.raw_pair(int(idx))
        return self._dataset.__getitem__(int(idx), self._epoch)


def grain_batch_iterator(
    dataset,
    batch_size: int,
    seed: int = 0,
    epoch: int = 0,
    num_workers: int = 8,
    raw: bool = False,
    shard_index: int = 0,
    shard_count: int = 1,
    drop_remainder: bool = True,
) -> Iterator[dict]:
    """Multiprocess batches of PretrainDataset samples.

    Sharding: each host reads only its 1/shard_count slice (feed the
    result through parallel.mesh.shard_batch for global assembly).
    """
    import grain.python as gp

    source = _DatasetAdapter(dataset, epoch, raw)
    sampler = gp.IndexSampler(
        num_records=len(source),
        shard_options=gp.ShardOptions(
            shard_index=shard_index, shard_count=shard_count, drop_remainder=True
        ),
        shuffle=True,
        num_epochs=1,
        seed=seed + epoch,
    )
    loader = gp.DataLoader(
        data_source=source,
        sampler=sampler,
        operations=[gp.Batch(batch_size=batch_size, drop_remainder=drop_remainder)],
        worker_count=num_workers,
    )
    for batch in loader:
        yield {k: np.asarray(v) for k, v in batch.items()}
