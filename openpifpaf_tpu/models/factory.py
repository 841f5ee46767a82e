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


#: family-level backbone options, mutated by ``cli``/``configure`` (the
#: reference's class-attribute pattern, basenetworks.py:357-405 /
#: 155-183, expressed as explicit dicts)
SHUFFLENETV2K_OPTIONS = {
    'kernel': 5,
    'stage4_dilation': 1,
    'input_conv2_stride': 0,
    'input_conv2_outchannels': None,
    'conv5_as_stage': False,
    'norm': 'batch',
    'non_linearity': 'relu',
}
RESNET_OPTIONS = {
    'pool0_stride': 0,
    'input_conv_stride': 2,
    'input_conv2_stride': 0,
    'block5_dilation': 1,
    'remove_last_block': False,
}


def _snk(repeats, channels):
    return lambda: basenetworks.ShuffleNetV2K(
        stages_repeats=repeats, stages_out_channels=channels,
        **SHUFFLENETV2K_OPTIONS)


def _resnet(layers, **fixed):
    return lambda: basenetworks.Resnet(layers=layers, **fixed,
                                       **RESNET_OPTIONS)


BASE_FACTORIES = {
    'shufflenetv2k16': _snk([4, 8, 4], [24, 348, 696, 1392, 1392]),
    'shufflenetv2k20': _snk([5, 10, 5], [32, 512, 1024, 2048, 2048]),
    'shufflenetv2k30': _snk([8, 16, 6], [32, 512, 1024, 2048, 2048]),
    'shufflenetv2k44': _snk([12, 24, 8], [32, 512, 1024, 2048, 2048]),
    'shufflenetv2kx5': _snk([6, 13, 6], [42, 640, 1280, 2560, 2560]),
    # original torchvision ShuffleNetV2 (k=3 blocks, max-pool removed ->
    # stride 16; network/basenetworks.py:36-56)
    'shufflenetv2x1': lambda: basenetworks.ShuffleNetV2K(
        stages_repeats=[4, 8, 4], stages_out_channels=[24, 116, 232, 464, 1024],
        kernel=3),
    'shufflenetv2x2': lambda: basenetworks.ShuffleNetV2K(
        stages_repeats=[4, 8, 4], stages_out_channels=[24, 244, 488, 976, 2048],
        kernel=3),
    'resnet18': _resnet((2, 2, 2, 2), base_features=64, basic_block=True),
    'resnet50': _resnet((3, 4, 6, 3)),
    'resnet101': _resnet((3, 4, 23, 3)),
    'resnet152': _resnet((3, 8, 36, 3)),
    'resnext50': _resnet((3, 4, 6, 3), groups=32, width_per_group=4),
    'resnext101': _resnet((3, 4, 23, 3), groups=32, width_per_group=8),
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


#: --head-consolidation default (reference network/factory.py:163-167)
HEAD_CONSOLIDATION = 'filter_and_extend'

#: --cf4-dropout (reference heads.py:314-316)
CF4_OPTIONS = {'dropout_p': 0.0}


def cli(parser):
    """Backbone configuration flags (reference basenetworks.py cli
    classmethods: shufflenetv2k 357-390, resnet 152-176)."""
    group = parser.add_argument_group('network')
    group.add_argument('--head-consolidation',
                       choices=('keep', 'create', 'filter_and_extend'),
                       default=HEAD_CONSOLIDATION,
                       help='consolidation strategy for a checkpoint\'s '
                            'head networks and the heads specified by the '
                            'datamodule')
    group.add_argument('--cf4-dropout', default=0.0, type=float,
                       help='CompositeField4 dropout probability')
    group.add_argument('--no-download-progress', dest='download_progress',
                       default=True, action='store_false',
                       help='suppress checkpoint download progress output')
    # reference-compat: torchvision-pretrained initialization switches.
    # From-scratch init here is always random (no torchvision); these are
    # accepted so reference command lines keep working.
    for name in ('resnet', 'shufflenetv2', 'mobilenetv2', 'mobilenetv3',
                 'squeezenet'):
        group.add_argument(f'--{name}-no-pretrain',
                           dest=f'{name}_pretrained',
                           default=True, action='store_false',
                           help='(compat) from-scratch init is always '
                                'random here')
    group = parser.add_argument_group('shufflenetv2k')
    group.add_argument('--shufflenetv2k-input-conv2-stride',
                       default=SHUFFLENETV2K_OPTIONS['input_conv2_stride'],
                       type=int,
                       help='stride of the optional 2nd input convolution')
    group.add_argument('--shufflenetv2k-input-conv2-outchannels',
                       default=SHUFFLENETV2K_OPTIONS['input_conv2_outchannels'],
                       type=int,
                       help='out channels of the optional 2nd input conv')
    group.add_argument('--shufflenetv2k-stage4-dilation',
                       default=SHUFFLENETV2K_OPTIONS['stage4_dilation'],
                       type=int, help='dilation factor of stage 4')
    group.add_argument('--shufflenetv2k-kernel',
                       default=SHUFFLENETV2K_OPTIONS['kernel'], type=int,
                       help='kernel width')
    group.add_argument('--shufflenetv2k-conv5-as-stage',
                       default=False, action='store_true')
    norm_group = group.add_mutually_exclusive_group()
    norm_group.add_argument('--shufflenetv2k-instance-norm',
                            default=False, action='store_true')
    norm_group.add_argument('--shufflenetv2k-group-norm',
                            default=False, action='store_true')
    group.add_argument('--shufflenetv2k-leaky-relu',
                       default=False, action='store_true')

    group = parser.add_argument_group('ResNet')
    group.add_argument('--resnet-pool0-stride',
                       default=RESNET_OPTIONS['pool0_stride'], type=int,
                       help='stride of zero removes the pooling op')
    group.add_argument('--resnet-input-conv-stride',
                       default=RESNET_OPTIONS['input_conv_stride'], type=int,
                       help='stride of the input convolution')
    group.add_argument('--resnet-input-conv2-stride',
                       default=RESNET_OPTIONS['input_conv2_stride'], type=int,
                       help='stride of the optional 2nd input convolution')
    group.add_argument('--resnet-block5-dilation',
                       default=RESNET_OPTIONS['block5_dilation'], type=int,
                       help='use dilated convs in block5')
    group.add_argument('--resnet-remove-last-block',
                       default=False, action='store_true',
                       help='create a network without the last block')


def configure(args):
    global HEAD_CONSOLIDATION
    HEAD_CONSOLIDATION = args.head_consolidation
    CF4_OPTIONS['dropout_p'] = args.cf4_dropout
    SHUFFLENETV2K_OPTIONS.update(
        input_conv2_stride=args.shufflenetv2k_input_conv2_stride,
        input_conv2_outchannels=args.shufflenetv2k_input_conv2_outchannels,
        stage4_dilation=args.shufflenetv2k_stage4_dilation,
        kernel=args.shufflenetv2k_kernel,
        conv5_as_stage=args.shufflenetv2k_conv5_as_stage,
    )
    if args.shufflenetv2k_instance_norm:
        SHUFFLENETV2K_OPTIONS['norm'] = 'instance'
    if args.shufflenetv2k_group_norm:
        SHUFFLENETV2K_OPTIONS['norm'] = 'group'
    if args.shufflenetv2k_leaky_relu:
        SHUFFLENETV2K_OPTIONS['non_linearity'] = 'leaky_relu'

    RESNET_OPTIONS.update(
        pool0_stride=args.resnet_pool0_stride,
        input_conv_stride=args.resnet_input_conv_stride,
        input_conv2_stride=args.resnet_input_conv2_stride,
        block5_dilation=args.resnet_block5_dilation,
        remove_last_block=args.resnet_remove_last_block,
    )


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
                                       head_metas=head_metas,
                                       head_consolidation=HEAD_CONSOLIDATION)
        return self.from_scratch(head_metas)

    @staticmethod
    def _init_on_host(build):
        """Run a flax ``init`` on the host CPU backend, then transfer.

        Eager flax init dispatches one op per parameter; against a
        remote TPU backend each dispatch is a network round-trip
        (measured: 76 s for shufflenetv2k16+cocokp vs 20 s on the host
        CPU). Initializing on CPU and shipping the finished pytree in
        one bulk transfer keeps startup host-bound. Falls back to the
        default device when no CPU backend is available.
        """
        try:
            cpu = jax.local_devices(backend='cpu')[0]
        except RuntimeError:
            return build()
        if jax.default_backend() == 'cpu':
            return build()
        with jax.default_device(cpu):
            variables = build()
        # local_devices()[0], not devices()[0]: in multi-process runs the
        # global device 0 is not addressable from non-zero hosts. The
        # transfer commits the pytree to this process's first local device;
        # downstream jits re-place via explicit in_shardings.
        return jax.device_put(variables, jax.local_devices()[0])

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
                def build():
                    dummy = jnp.zeros(input_shape, dtype=jnp.float32)
                    return model.init(rng, dummy, train=True)
                return Factory._init_on_host(build)

            return model, init_variables

        def build_head(meta):
            head_cls = HEADS[type(meta)]
            if head_cls is heads.CompositeField4 \
                    and CF4_OPTIONS['dropout_p']:
                return head_cls(meta=meta,
                                dropout_p=CF4_OPTIONS['dropout_p'])
            return head_cls(meta=meta)

        head_nets = tuple(build_head(meta) for meta in head_metas)
        model = Shell(base_net=base_net, head_nets=head_nets)

        def init_variables(rng, input_shape=(1, 97, 129, 3)):
            def build():
                dummy = jnp.zeros(input_shape, dtype=jnp.float32)
                return model.init({'params': rng,
                                   'dropout': jax.random.fold_in(rng, 1)},
                                  dummy, train=True)
            return Factory._init_on_host(build)

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
