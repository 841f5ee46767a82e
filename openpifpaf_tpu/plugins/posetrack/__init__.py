"""PoseTrack plugin: video pose tracking datasets.

Registers ``cocokpst`` (tracking training synthesized from still COCO
images) and ``posetrack2018`` (the real video dataset).
"""

from ...datasets.factory import DATAMODULES
from .cocokpst import CocoKpSt
from .posetrack2018 import Posetrack2018


def register():
    DATAMODULES['cocokpst'] = CocoKpSt
    DATAMODULES['posetrack2018'] = Posetrack2018
