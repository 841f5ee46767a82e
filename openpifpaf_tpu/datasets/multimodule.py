"""MultiDataModule (reference ``datasets/multimodule.py:10-73``)."""

from .module import DataModule


class ConcatenatedLists:
    def __init__(self, lists):
        self.lists = lists

    def __iter__(self):
        for l in self.lists:
            yield from l

    def __getitem__(self, index):
        for l in self.lists:
            if index < len(l):
                return l[index]
            index -= len(l)
        raise IndexError

    def __len__(self):
        return sum(len(l) for l in self.lists)


class MultiDataModule(DataModule):
    #: --dataset-weights: round-robin sampling weights per dataset
    #: (reference datasets/factory.py:27-28)
    weights = None

    def __init__(self, datamodules):
        self.datamodules = datamodules
        self.head_metas = list(ConcatenatedLists(
            [dm.head_metas for dm in datamodules]))

    def metrics(self):
        return [m for dm in self.datamodules for m in dm.metrics()]

    def train_loader(self):
        from .multiloader import MultiLoader
        return MultiLoader([dm.train_loader() for dm in self.datamodules],
                           len(self.head_metas), weights=self.weights)

    def val_loader(self):
        from .multiloader import MultiLoader
        return MultiLoader([dm.val_loader() for dm in self.datamodules],
                           len(self.head_metas), weights=self.weights)

    def eval_loader(self):
        raise NotImplementedError('use the individual datamodules for eval')
