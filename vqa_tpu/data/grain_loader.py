"""Optional Grain-based input pipeline adapter.

The default feed is ``vqa_tpu.data.loader.Loader`` (vectorized batched
gathers + background prefetch — the fast path for packed shards). This
module adapts the same dataset objects to a ``grain.python.DataLoader`` for
users who want Grain's multiprocess workers, determinism bookkeeping, and
checkpointable iterators (the BASELINE.json "tf.data/Grain -> HBM feed"
surface). Per-record access goes through ``dataset[i]``; Grain batches and
shards.

Protocol parity with ``Loader`` (round 4): every batch carries ``nvalid``
and the tail batch is padded to ``batch_size`` by repeating row 0 — the
same fixed-shape contract the jitted train/eval steps consume — so the
adapter is drop-in for the padded-tail + nvalid protocol. Pass
``drop_remainder=True`` to drop the tail instead (still fixed-shape).
"""

from __future__ import annotations

from typing import Optional

import numpy as np


class _Source:
    """Grain RandomAccessDataSource over a vqa_tpu dataset."""

    def __init__(self, dataset):
        self._dataset = dataset

    def __len__(self) -> int:
        return len(self._dataset)

    def __getitem__(self, idx):
        return self._dataset[int(idx)]


def _pad_tail_fn(batch_size: int):
    """Loader's tail protocol: pad to batch_size by repeating row 0, attach
    nvalid (loader.py _batches) so eval masks padded rows."""

    def fn(batch):
        n = len(next(iter(batch.values())))
        out = {k: np.asarray(v) for k, v in batch.items()}
        if n < batch_size:
            out = {k: np.concatenate(
                [v, np.repeat(v[:1], batch_size - n, axis=0)], axis=0)
                for k, v in out.items()}
        out["nvalid"] = np.int32(n)
        return out

    return fn


def make_grain_loader(dataset,
                      batch_size: int,
                      shuffle: bool = False,
                      seed: int = 1111,
                      num_epochs: Optional[int] = 1,
                      worker_count: int = 0,
                      drop_remainder: bool = False):
    """Build a grain.python.DataLoader over a vqa_tpu dataset.

    Batches match ``Loader``'s contract: fixed [batch_size, ...] shapes
    (tail padded by repeating row 0 unless ``drop_remainder``) and an
    ``nvalid`` scalar for masking.
    """
    import grain.python as pygrain

    class _PadTail(pygrain.MapTransform):
        def __init__(self):
            self._fn = _pad_tail_fn(batch_size)

        def map(self, batch):
            return self._fn(batch)

    sampler = pygrain.IndexSampler(
        num_records=len(dataset),
        shard_options=pygrain.NoSharding(),
        shuffle=shuffle,
        seed=seed,
        num_epochs=num_epochs,
    )
    return pygrain.DataLoader(
        data_source=_Source(dataset),
        sampler=sampler,
        operations=[pygrain.Batch(batch_size, drop_remainder=drop_remainder),
                    _PadTail()],
        worker_count=worker_count,
    )
