"""Datasets: DataModule contract, registry and loaders."""

from .module import DataModule
from .factory import DATAMODULES, factory
from .image_list import ImageList, NumpyImageList, PilImageList
from .loader import Loader
from .loader_with_reset import LoaderWithReset
from .multiloader import MultiLoader
from .multimodule import MultiDataModule
from .kp_module import KpDataModule
from .wrapped import WrappedDataset
from . import collate
