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

#: sentinel for checkpoint names whose pretrained weights are not published
#: (reference network/factory.py:37)
PRETRAINED_UNAVAILABLE = object()


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
            return ckpt_mod.load_shell(resolve_checkpoint(self.checkpoint),
                                       head_metas=head_metas)
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


def checkpoint_cache_dir():
    import os
    return os.environ.get(
        'OPENPIFPAF_TPU_CACHE',
        os.path.join(os.path.expanduser('~'), '.cache', 'openpifpaf_tpu'))


def resolve_checkpoint(checkpoint: str) -> str:
    """Resolve a checkpoint argument to a local path.

    Accepts a path of this framework's checkpoints, a reference PyTorch
    checkpoint file, or a published checkpoint *name* registered in
    ``CHECKPOINT_URLS`` (downloaded to the cache with a hash check, like
    the reference's torch.hub flow, network/factory.py:251-266; the
    downloaded .pkl converts on load).
    """
    import hashlib
    import logging
    import os

    if os.path.exists(checkpoint) or os.path.exists(checkpoint + '.json'):
        return checkpoint

    url = CHECKPOINT_URLS.get(checkpoint)
    if url is None:
        return checkpoint  # let the loader error with context
    if url is PRETRAINED_UNAVAILABLE:
        available = sorted(k for k, v in CHECKPOINT_URLS.items()
                           if v is not PRETRAINED_UNAVAILABLE)
        raise ValueError(
            f'no pretrained weights published for {checkpoint!r}; '
            f'available: {available}')
    if os.path.exists(url):
        return url

    file_name = os.path.basename(url)
    cache_dir = checkpoint_cache_dir()
    local = os.path.join(cache_dir, file_name)
    if not os.path.exists(local):
        import urllib.request
        os.makedirs(cache_dir, exist_ok=True)
        logging.getLogger(__name__).info('downloading %s -> %s', url, local)
        tmp = local + '.partial'
        urllib.request.urlretrieve(url, tmp)
        os.replace(tmp, local)

    # torch.hub-style hash check: filename ...-<8 hex>.pkl must prefix the
    # sha256 of the contents
    stem = file_name.rsplit('.', 1)[0]
    suffix = stem.rsplit('-', 1)[-1]
    if len(suffix) == 8 and all(c in '0123456789abcdef' for c in suffix):
        sha = hashlib.sha256()
        with open(local, 'rb') as f:
            for chunk in iter(lambda: f.read(1 << 20), b''):
                sha.update(chunk)
        if not sha.hexdigest().startswith(suffix):
            raise ValueError(f'hash mismatch for {local}: expected prefix '
                             f'{suffix}, got {sha.hexdigest()[:8]}')
    return local
