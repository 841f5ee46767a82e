"""PoseTrack plugin: video pose tracking datasets.

Registers ``cocokpst`` (tracking training synthesized from still COCO
images), ``posetrack2018`` (the real video dataset), and
``posetrack2017`` (eval-only, old annolist format).
"""

from ...datasets.factory import DATAMODULES
from .cocokpst import CocoKpSt
from .posetrack2017 import Posetrack2017
from .posetrack2018 import Posetrack2018


from ...models import factory as models_factory


def register():
    DATAMODULES['cocokpst'] = CocoKpSt
    DATAMODULES['posetrack2018'] = Posetrack2018
    DATAMODULES['posetrack2017'] = Posetrack2017
    _register_checkpoints()

def _register_checkpoints():
    # reference plugins/posetrack/__init__.py:9-12
    models_factory.CHECKPOINT_URLS['tshufflenetv2k16'] = \
        models_factory.PRETRAINED_UNAVAILABLE
    models_factory.CHECKPOINT_URLS['tshufflenetv2k30'] = (
        'http://github.com/openpifpaf/torchhub/releases/download/v0.12.10/'
        'tshufflenetv2k30-210628-075118-posetrack2018-cocokpst-'
        'slurm668247-o25-3d734bb8.pkl')
