"""Dataset registry and factory (reference ``datasets/factory.py:5-15``)."""

DATAMODULES = {}


def factory(dataset_name: str):
    if '-' in dataset_name:
        from .multimodule import MultiDataModule
        return MultiDataModule([factory(n) for n in dataset_name.split('-')])

    if dataset_name not in DATAMODULES:
        raise ValueError(f'dataset {dataset_name!r} unknown; '
                         f'available: {sorted(DATAMODULES)}')
    return DATAMODULES[dataset_name]()
