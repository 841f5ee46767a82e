"""Data loader.

The reference relies on torch's DataLoader with fork workers
(``datasets/module.py:49-56``). Here the loader is a plain Python iterator
with optional multiprocessing workers; batches are numpy pytrees handed to
jitted device functions by the trainer/predictor.
"""

import logging

import numpy as np

LOG = logging.getLogger(__name__)


class Loader:
    """Batching loader over an indexable dataset.

    shard_id/num_shards implement host-level data sharding for multi-host
    training (each host loads its slice; the trainer forms global arrays via
    jax.make_array_from_process_local_data).
    """

    def __init__(self, dataset, *, batch_size=1, shuffle=False,
                 collate_fn=None, drop_last=False, num_workers=0,
                 seed=0, shard_id=0, num_shards=1):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.collate_fn = collate_fn or (lambda items: items)
        self.drop_last = drop_last
        self.num_workers = num_workers
        self.epoch = 0
        self.seed = seed
        self.shard_id = shard_id
        self.num_shards = num_shards

    def set_epoch(self, epoch):
        self.epoch = epoch

    def _indices(self):
        n = len(self.dataset)
        indices = np.arange(n)
        if self.shuffle:
            rng = np.random.RandomState(self.seed + self.epoch)
            rng.shuffle(indices)
        if self.num_shards > 1:
            # equal shards (drop remainder) so every host steps in sync
            per_shard = n // self.num_shards
            indices = indices[self.shard_id * per_shard:
                              (self.shard_id + 1) * per_shard]
        return indices

    def __len__(self):
        n = len(self._indices())
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def __iter__(self):
        indices = self._indices()
        if self.num_workers > 0:
            yield from self._iter_workers(indices)
            return
        batch = []
        for i in indices:
            batch.append(self.dataset[int(i)])
            if len(batch) == self.batch_size:
                yield self.collate_fn(batch)
                batch = []
        if batch and not self.drop_last:
            yield self.collate_fn(batch)

    def _iter_workers(self, indices):
        import multiprocessing as mp
        ctx = mp.get_context('fork')
        with ctx.Pool(self.num_workers) as pool:
            batches = [
                [int(i) for i in indices[s:s + self.batch_size]]
                for s in range(0, len(indices), self.batch_size)
            ]
            if self.drop_last and batches and len(batches[-1]) < self.batch_size:
                batches.pop()
            for items in pool.imap(self._load_items, batches, chunksize=1):
                yield self.collate_fn(items)

    def _load_items(self, index_batch):
        return [self.dataset[i] for i in index_batch]
