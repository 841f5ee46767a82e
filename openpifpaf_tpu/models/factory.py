"""Network factory and registries (reference ``network/factory.py``).

``BASE_FACTORIES`` maps backbone names to zero-arg constructors returning a
Flax module (with ``stride`` / ``out_features`` properties); ``HEADS`` maps
head-meta classes to head-network classes. ``Factory.factory(head_metas)``
assembles a ``Shell`` and initializes (or restores) its variables.
"""

import logging
from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from .. import headmeta
from . import basenetworks, heads
from .shell import Shell, assign_strides

LOG = logging.getLogger(__name__)


BASE_FACTORIES = {
    'shufflenetv2k16': lambda: basenetworks.ShuffleNetV2K(
        stages_repeats=[4, 8, 4], stages_out_channels=[24, 348, 696, 1392, 1392]),
    'shufflenetv2k20': lambda: basenetworks.ShuffleNetV2K(
        stages_repeats=[5, 10, 5], stages_out_channels=[32, 512, 1024, 2048, 2048]),
    'shufflenetv2k30': lambda: basenetworks.ShuffleNetV2K(
        stages_repeats=[8, 16, 6], stages_out_channels=[32, 512, 1024, 2048, 2048]),
    'shufflenetv2k44': lambda: basenetworks.ShuffleNetV2K(
        stages_repeats=[12, 24, 8], stages_out_channels=[32, 512, 1024, 2048, 2048]),
    'shufflenetv2kx5': lambda: basenetworks.ShuffleNetV2K(
        stages_repeats=[6, 13, 6], stages_out_channels=[42, 640, 1280, 2560, 2560]),
    # original torchvision ShuffleNetV2 (k=3 blocks, max-pool removed ->
    # stride 16; network/basenetworks.py:36-56)
    'shufflenetv2x1': lambda: basenetworks.ShuffleNetV2K(
        stages_repeats=[4, 8, 4], stages_out_channels=[24, 116, 232, 464, 1024],
        kernel=3),
    'shufflenetv2x2': lambda: basenetworks.ShuffleNetV2K(
        stages_repeats=[4, 8, 4], stages_out_channels=[24, 244, 488, 976, 2048],
        kernel=3),
    'resnet18': lambda: basenetworks.Resnet(
        layers=(2, 2, 2, 2), base_features=64, basic_block=True),
    'resnet50': lambda: basenetworks.Resnet(layers=(3, 4, 6, 3)),
    'resnet101': lambda: basenetworks.Resnet(layers=(3, 4, 23, 3)),
    'resnet152': lambda: basenetworks.Resnet(layers=(3, 8, 36, 3)),
    'resnext50': lambda: basenetworks.Resnet(
        layers=(3, 4, 6, 3), groups=32, width_per_group=4),
    'resnext101': lambda: basenetworks.Resnet(
        layers=(3, 4, 23, 3), groups=32, width_per_group=8),
    'mobilenetv2': basenetworks.MobileNetV2,
    'mobilenetv3large': lambda: basenetworks.MobileNetV3(variant='large'),
    'mobilenetv3small': lambda: basenetworks.MobileNetV3(variant='small'),
    'squeezenet': basenetworks.SqueezeNet,
}

# tracking backbones: same networks; the reference's 't' prefix only adds
# the eval-time feature cache, which here lives in the video pipeline
BASE_FACTORIES.update({
    'tshufflenetv2k16': BASE_FACTORIES['shufflenetv2k16'],
    'tshufflenetv2k30': BASE_FACTORIES['shufflenetv2k30'],
    'tresnet50': BASE_FACTORIES['resnet50'],
})

BASE_TYPES = {basenetworks.ShuffleNetV2K, basenetworks.Resnet}

HEADS = {
    headmeta.Cif: heads.CompositeField4,
    headmeta.Caf: heads.CompositeField4,
    headmeta.CifDet: heads.CompositeField4,
    headmeta.TSingleImageCif: heads.CompositeField4,
    headmeta.TSingleImageCaf: heads.CompositeField4,
}

#: checkpoint name -> url or path (filled by plugins)
CHECKPOINT_URLS = {}


class Factory:
    base_name: Optional[str] = 'shufflenetv2k16'
    checkpoint: Optional[str] = None
    upsample_stride: int = 1

    def __init__(self, **kwargs):
        for k, v in kwargs.items():
            assert hasattr(self, k)
            setattr(self, k, v)

    def factory(self, *, head_metas: Sequence[headmeta.Base]):
        """Build a Shell model for the given head metas.

        Returns (model, variables_initializer) where variables_initializer
        is fn(rng, input_shape) -> variables pytree.
        """
        if self.checkpoint is not None:
            from ..training import checkpoint as ckpt_mod  # circular-safe
            return ckpt_mod.load_shell(self.checkpoint, head_metas=head_metas)
        return self.from_scratch(head_metas)

    def from_scratch(self, head_metas: Sequence[headmeta.Base]):
        if self.base_name not in BASE_FACTORIES:
            raise ValueError(f'unknown base network {self.base_name!r}; '
                             f'available: {sorted(BASE_FACTORIES)}')
        base_net = BASE_FACTORIES[self.base_name]()
        for meta in head_metas:
            meta.upsample_stride = self.upsample_stride
        assign_strides(head_metas, base_net.stride)

        tracking = any(
            isinstance(meta, (headmeta.Tcaf, headmeta.TSingleImageCif,
                              headmeta.TSingleImageCaf))
            for meta in head_metas)
        if tracking:
            from .tracking import TrackingShell, TBaseSingleImage
            from .tracking import Tcaf as TcafHead
            head_nets = tuple(
                TcafHead(meta=meta) if isinstance(meta, headmeta.Tcaf)
                else TBaseSingleImage(meta=meta)
                for meta in head_metas)
            model = TrackingShell(base_net=base_net, head_nets=head_nets)

            def init_variables(rng, input_shape=(2, 97, 129, 3)):
                dummy = jnp.zeros(input_shape, dtype=jnp.float32)
                return model.init(rng, dummy, train=True)

            return model, init_variables

        head_nets = tuple(HEADS[type(meta)](meta=meta) for meta in head_metas)
        model = Shell(base_net=base_net, head_nets=head_nets)

        def init_variables(rng, input_shape=(1, 97, 129, 3)):
            dummy = jnp.zeros(input_shape, dtype=jnp.float32)
            return model.init(rng, dummy, train=True)

        return model, init_variables


def local_checkpoint_path(checkpoint: str):
    import os
    if os.path.exists(checkpoint):
        return checkpoint
    if checkpoint in CHECKPOINT_URLS:
        return CHECKPOINT_URLS[checkpoint]
    return None
