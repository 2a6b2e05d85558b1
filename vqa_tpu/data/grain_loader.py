"""Optional Grain-based input pipeline adapter.

The default feed is ``vqa_tpu.data.loader.Loader`` (vectorized batched
gathers + background prefetch — the fast path for packed shards). This
module adapts the same dataset objects to a ``grain.python.DataLoader`` for
users who want Grain's multiprocess workers, determinism bookkeeping, and
checkpointable iterators (the BASELINE.json "tf.data/Grain -> HBM feed"
surface). Per-record access goes through ``dataset[i]``; Grain batches and
shards.
"""

from __future__ import annotations

from typing import Optional


class _Source:
    """Grain RandomAccessDataSource over a vqa_tpu dataset."""

    def __init__(self, dataset):
        self._dataset = dataset

    def __len__(self) -> int:
        return len(self._dataset)

    def __getitem__(self, idx):
        return self._dataset[int(idx)]


def make_grain_loader(dataset,
                      batch_size: int,
                      shuffle: bool = False,
                      seed: int = 1111,
                      num_epochs: Optional[int] = 1,
                      worker_count: int = 0,
                      drop_remainder: bool = False):
    """Build a grain.python.DataLoader over a vqa_tpu dataset.

    Note: unlike ``Loader`` the tail batch is NOT padded to a fixed shape;
    pass ``drop_remainder=True`` for jit-stable shapes, or keep the default
    Loader for the padded-tail + nvalid protocol.
    """
    import grain.python as pygrain

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
        operations=[pygrain.Batch(batch_size, drop_remainder=drop_remainder)],
        worker_count=worker_count,
    )
