"""Datasets: DataModule contract, registry and loaders."""

from .module import DataModule
from .factory import DATAMODULES, factory
from .image_list import ImageList, NumpyImageList, PilImageList
from . import collate
