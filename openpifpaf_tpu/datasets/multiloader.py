"""MultiLoader: weighted round-robin over several dataset loaders
(reference ``datasets/multiloader.py:26-76``). Each dataset's targets are
mapped into its global head slots; other heads get None."""

import logging

LOG = logging.getLogger(__name__)


class MultiLoader:
    def __init__(self, loaders, n_heads, *, weights=None):
        self.loaders = loaders
        self.n_heads = n_heads

        if weights is None:
            weights = [1.0 for _ in loaders]
        assert len(weights) == len(loaders)
        total = sum(weights)
        self.weights = [w / total for w in weights]

    def set_epoch(self, epoch):
        for loader in self.loaders:
            if hasattr(loader, 'set_epoch'):
                loader.set_epoch(epoch)

    def __len__(self):
        return sum(len(l) for l in self.loaders)

    def _expand_targets(self, targets, metas):
        """Place this dataset's targets into the global head slots."""
        out = [None] * self.n_heads
        head_indices = metas[0].get('head_indices', range(len(targets)))
        for t, head_i in zip(targets, head_indices):
            out[head_i] = t
        return out

    def __iter__(self):
        iterators = [iter(l) for l in self.loaders]
        remaining = [len(l) for l in self.loaders]

        while any(r > 0 for r in remaining):
            # pick the loader that is most behind its target share
            total_remaining = sum(remaining)
            shares = [
                r / total_remaining / w if w > 0 else 0.0
                for r, w in zip(remaining, self.weights)
            ]
            loader_i = max(range(len(self.loaders)), key=lambda i: shares[i])
            try:
                images, targets, metas = next(iterators[loader_i])
            except StopIteration:
                remaining[loader_i] = 0
                continue
            remaining[loader_i] -= 1
            yield images, self._expand_targets(targets, metas), metas
