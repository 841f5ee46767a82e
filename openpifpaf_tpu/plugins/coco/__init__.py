"""COCO plugin: keypoint (cocokp) and detection (cocodet) data modules."""

from ... import datasets
from .cocokp import CocoKp
from .cocodet import CocoDet


def register():
    datasets.DATAMODULES['cocokp'] = CocoKp
    datasets.DATAMODULES['cocodet'] = CocoDet
