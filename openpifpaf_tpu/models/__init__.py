"""Model zoo: Flax backbones, composite-field heads, and the Shell.

All modules are NHWC (TPU-native conv layout); head outputs are presented in
the reference's (B, F, C, H, W) field layout at the API boundary.
"""

from . import basenetworks, heads, shell, factory, tracking
from .basenetworks import ShuffleNetV2K, Resnet
from .heads import CompositeField4
from .shell import Shell
from .factory import Factory, BASE_FACTORIES, HEADS, CHECKPOINT_URLS
