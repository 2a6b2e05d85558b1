"""Host-side batch feed with background prefetch.

Replaces the reference's ``torch.utils.data.DataLoader(num_workers=4,
pin_memory=True)`` (`/root/reference/main.py:178-200`). Differences, by
design for TPU:

- **Fixed shapes**: every batch has exactly ``batch_size`` rows; the tail
  batch is padded by repeating row 0 and carries ``nvalid`` so eval can mask
  padded rows. No recompilation, no dynamic shapes under jit.
- **Vectorized assembly**: the dataset's ``get_batch`` gathers a whole batch
  at once (packed shards: one memmap fancy-index) instead of per-item
  ``__getitem__`` + collate.
- **Pipelined**: a background thread prepares the next batches while the
  device computes; combined with ``jax.device_put`` this double-buffers the
  host->HBM copy behind the step (SURVEY.md section 7.1 "input pipeline").
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Dict, Iterator, Optional

import numpy as np


class Loader:
    """Iterable over fixed-shape numpy batches with shuffle + prefetch."""

    def __init__(self,
                 dataset,
                 batch_size: int,
                 shuffle: bool = False,
                 seed: int = 1111,
                 drop_last: bool = False,
                 prefetch: int = 2,
                 transform: Optional[Callable[[Dict[str, np.ndarray]],
                                              Dict[str, np.ndarray]]] = None,
                 batch_method: str = "get_batch",
                 length: Optional[int] = None,
                 num_shards: int = 1,
                 shard_id: int = 0,
                 length_bucket: bool = False,
                 bucket_bounds: tuple = (8, 12, 16, 20)):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.rng = np.random.default_rng(seed)
        self.drop_last = drop_last
        self.prefetch = prefetch
        self.transform = transform
        # e.g. "get_batch_all" for the max-relevance candidate feed
        self.batch_method = batch_method
        # index-space override: get_batch_all iterates question indices even
        # though the all-captions dataset reports 5x length
        self.length = length if length is not None else len(dataset)
        # Multi-host data sharding (SURVEY.md section 5.8): every host draws
        # the SAME permutation (seeded identically) and takes the strided
        # slice order[shard_id::num_shards] — disjoint cover, no coordination.
        # batch_size is the per-host batch.
        assert 0 <= shard_id < num_shards, (shard_id, num_shards)
        self.num_shards = num_shards
        self.shard_id = shard_id
        # Caption length bucketing (training feed): group samples whose
        # cap_len falls in the same bucket and truncate the batch's caption
        # axis to the bucket bound — the decoder scan then runs bound-1
        # steps instead of c_len-1 (real captions average ~10 of 20 tokens,
        # so ~45% of the reference-shaped decode work is masked padding;
        # PERF.md "MTL train step"). Loss-equivalent: every step beyond a
        # sample's cap_len is masked to zero either way. Batch COMPOSITION
        # differs from the reference's uniform shuffle (documented
        # divergence; off by default, --length_bucket). One compiled step
        # per distinct bound.
        self.length_bucket = length_bucket
        self.bucket_bounds = tuple(sorted(bucket_bounds))
        if length_bucket:
            assert num_shards == 1, (
                "length_bucket with multi-host sharding would need "
                "host-synchronized bucket schedules (different caption "
                "lengths per host deadlock lockstep collectives); disable "
                "one of them")
            assert getattr(dataset, "cap_lens", None) is not None, (
                "length_bucket needs dataset.cap_lens (caption datasets)")
            # the loss-equivalence contract requires the top bucket to
            # COVER the longest caption: a cap_len above the last bound
            # would land in the last bucket and have real tokens cut by
            # the bound+1 truncation (main.py appends c_len as a guard;
            # enforce it here too for direct library users)
            max_len = int(np.max(np.asarray(dataset.cap_lens)[:self.length]))
            if self.bucket_bounds[-1] < max_len:
                self.bucket_bounds = tuple(
                    sorted(set(self.bucket_bounds) | {max_len}))

    @classmethod
    def for_process(cls, dataset, batch_size, **kw):
        """Loader sharded over jax processes (multi-host training)."""
        import jax
        return cls(dataset, batch_size, num_shards=jax.process_count(),
                   shard_id=jax.process_index(), **kw)

    @property
    def shard_length(self) -> int:
        """Samples this shard iterates (== length when unsharded).

        All shards report the SAME ceil(length / num_shards): short shards
        wrap-pad so every host runs the same number of batches — unequal
        counts would deadlock lockstep collectives.
        """
        return (self.length + self.num_shards - 1) // self.num_shards

    def __len__(self) -> int:
        if self.length_bucket:
            counts = self._bucket_counts()
            if self.drop_last:
                return sum(c // self.batch_size for c in counts)
            return sum(-(-c // self.batch_size) for c in counts if c)
        n = self.shard_length
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _bucket_of(self, lens: np.ndarray) -> np.ndarray:
        """Index of the first bound >= len (lengths above the last bound
        share the last bucket)."""
        bounds = np.asarray(self.bucket_bounds)
        return np.minimum(np.searchsorted(bounds, lens), len(bounds) - 1)

    def _bucket_counts(self):
        lens = np.asarray(self.dataset.cap_lens)[:self.length]
        which = self._bucket_of(lens)
        return [int(np.sum(which == b)) for b in range(len(self.bucket_bounds))]

    @property
    def num_samples(self) -> int:
        return self.shard_length

    def _bucketed_batches(self, order) -> Iterator[Dict[str, np.ndarray]]:
        lens = np.asarray(self.dataset.cap_lens)
        which = self._bucket_of(lens[order])
        plan = []                                  # (idx [batch_size], nvalid, bound)
        for b, bound in enumerate(self.bucket_bounds):
            members = order[which == b]
            for start in range(0, len(members), self.batch_size):
                idx = members[start:start + self.batch_size]
                nvalid = len(idx)
                if nvalid < self.batch_size:
                    if self.drop_last:
                        continue
                    pad = np.full(self.batch_size - nvalid, idx[0])
                    idx = np.concatenate([idx, pad])
                plan.append((idx, nvalid, bound))
        if self.shuffle:                           # interleave buckets
            self.rng.shuffle(plan)
        for idx, nvalid, bound in plan:
            batch = getattr(self.dataset, self.batch_method)(list(idx))
            batch["nvalid"] = np.int32(nvalid)
            # keep ONE padded position beyond the bound: CaptionEmbedding's
            # max-pool zero-fills padded steps, so a row whose valid
            # activations are all negative pools to 0 — that zero candidate
            # must survive truncation for caption-reading predictors to be
            # bit-equal to the full-length batch (ops/caption.py quirk note)
            if "c" in batch and bound + 1 < batch["c"].shape[1]:
                batch["c"] = batch["c"][:, :bound + 1]
            if self.transform is not None:
                batch = self.transform(batch)
            yield batch

    def _batches(self) -> Iterator[Dict[str, np.ndarray]]:
        # epoch-stable permutation: every shard derives the same order
        order = (self.rng.permutation(self.length) if self.shuffle
                 else np.arange(self.length))
        if self.length_bucket:
            yield from self._bucketed_batches(order)
            return
        if self.num_shards > 1:
            order = order[self.shard_id::self.num_shards]
            short = self.shard_length - len(order)
            if short > 0:   # wrap-pad so every shard runs equal batches
                order = np.concatenate([order, order[:short]])
        n = len(order)
        for start in range(0, n, self.batch_size):
            idx = order[start:start + self.batch_size]
            nvalid = len(idx)
            if nvalid < self.batch_size:
                if self.drop_last:
                    return
                pad = np.full(self.batch_size - nvalid, idx[0] if nvalid else 0)
                idx = np.concatenate([idx, pad])
            batch = getattr(self.dataset, self.batch_method)(list(idx))
            batch["nvalid"] = np.int32(nvalid)
            if self.transform is not None:
                batch = self.transform(batch)
            yield batch

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        """Iterate with background prefetch (daemon thread + bounded queue).

        Abandoning the iterator early (``break``, GC) shuts the producer
        down: its puts poll a stop flag, and the consumer's ``finally``
        (run on GeneratorExit) sets it — otherwise every abandoned
        iterator would leak a thread blocked on ``q.put`` pinning up to
        prefetch+1 assembled batches (gigabytes at serving shapes).
        """
        if self.prefetch <= 0:
            yield from self._batches()
            return
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        sentinel = object()
        error = []
        stop = threading.Event()

        def put(item) -> bool:
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.2)
                    return True
                except queue.Full:
                    continue
            return False

        def producer():
            try:
                for b in self._batches():
                    if not put(b):
                        return
            except BaseException as e:  # surface worker errors to the consumer
                error.append(e)
            finally:
                put(sentinel)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is sentinel:
                    if error:
                        raise error[0]
                    return
                yield item
        finally:
            stop.set()


def prefetch_to_device(iterator, mesh=None, size: int = 2,
                       keys=None):
    """Wrap a host-batch iterator so device transfer runs ahead of compute.

    Keeps up to ``size`` batches already transferred (sharded over the mesh
    when given) while the consumer computes — the standard double-buffering
    pattern that hides host->HBM copies behind the step. Non-array
    bookkeeping entries (``nvalid``, ``id``) pass through untouched.

    Sharding goes through ``parallel.mesh.shard_batch``: on a multi-host
    mesh (``jax.process_count() > 1``) each host's rows assemble into the
    global batch via ``make_array_from_process_local_data`` — a plain
    ``device_put`` with a global ``P('data')`` sharding would be wrong
    there (each host only holds its own shard of the batch).
    """
    import collections
    import jax
    from vqa_tpu.parallel.mesh import shard_batch

    # bookkeeping entries that must stay HOST values even when keys is
    # None: nvalid differs per host (wrap-padded tail shards), so
    # device-putting it under a replicated sharding on a multi-host mesh
    # would build a "replicated" global array with inconsistent
    # process-local values — silent cross-host divergence; and consumers
    # do int(batch.pop("nvalid")) on the host anyway
    _BOOKKEEPING = ("nvalid", "id")

    def wanted(k, v):
        if keys is not None:
            return k in keys
        return k not in _BOOKKEEPING and np.ndim(v) > 0

    def put(batch):
        if mesh is None:
            return {k: (jax.device_put(np.asarray(v)) if wanted(k, v)
                        else v)
                    for k, v in batch.items()}
        model_part = {k: v for k, v in batch.items() if wanted(k, v)}
        out = dict(batch)
        out.update(shard_batch(mesh, model_part))
        return out

    queue = collections.deque()
    for batch in iterator:
        queue.append(put(batch))
        if len(queue) >= size:
            yield queue.popleft()
    while queue:
        yield queue.popleft()
