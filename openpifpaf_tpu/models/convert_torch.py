"""Convert reference (PyTorch OpenPifPaf) checkpoints into this framework.

The reference pickles the *whole* ``nn.Module`` tree into its checkpoints
(reference ``network/trainer.py:410-425``:
``{'model': Shell, 'epoch': int, 'meta': {...}}``). Unpickling that normally
requires the reference package; here a stub-tolerant unpickler materializes
unknown classes as inert attribute bags, so the parameter/buffer tree can be
walked without importing (or having) the original code. Plain
``state_dict``-style checkpoints are handled too.

Weight layout translation:
  - conv weights: torch OIHW -> flax HWIO (works for grouped/depthwise too);
  - batch norm: weight/bias -> scale/bias params, running stats ->
    ``batch_stats`` collection;
  - module naming: explicit per-architecture maps (the reference registration
    order is documented in ``network/basenetworks.py``; ours in
    ``models/basenetworks.py``).

This unlocks running reference-trained weights on the TPU pipeline (AP-parity
evaluation) without any retraining.
"""

import dataclasses
import io
import logging
import pickle
from typing import Dict, List, Tuple

import numpy as np

from .. import headmeta

LOG = logging.getLogger(__name__)


# ------------------------------------------------------------------
# stub-tolerant unpickling
# ------------------------------------------------------------------

_ALLOWED_PREFIXES = (
    'torch', 'numpy', 'builtins', 'collections', 'argparse', 'copyreg',
    '_codecs', 'functools',
)


class _Stub:
    """Attribute bag standing in for an unimportable class."""

    _name = '?'

    def __init__(self, *args, **kwargs):
        self._args = args
        self._kwargs = kwargs

    def __setstate__(self, state):
        if isinstance(state, dict):
            self.__dict__.update(state)
        elif isinstance(state, tuple) and len(state) == 2:
            if state[0]:
                self.__dict__.update(state[0])
            if state[1]:
                self.__dict__.update(state[1])
        else:
            self.__dict__['_state'] = state

    def __repr__(self):
        return f'<stub {type(self)._name}>'


_STUB_CACHE: Dict[str, type] = {}


def _stub_class(module, name):
    full = f'{module}.{name}'
    if full not in _STUB_CACHE:
        _STUB_CACHE[full] = type(name, (_Stub,), {'_name': full})
    return _STUB_CACHE[full]


def _make_pickle_module():
    class StubUnpickler(pickle.Unpickler):
        def find_class(self, module, name):
            root = module.split('.')[0]
            if root in _ALLOWED_PREFIXES:
                return super().find_class(module, name)
            return _stub_class(module, name)

    mod = type('stub_pickle', (), {})()
    mod.__name__ = 'stub_pickle'
    mod.Unpickler = StubUnpickler
    mod.load = lambda f, **kw: StubUnpickler(f, **kw).load()
    mod.loads = lambda b, **kw: StubUnpickler(io.BytesIO(b), **kw).load()
    mod.dump = pickle.dump
    mod.dumps = pickle.dumps
    return mod


def load_torch_checkpoint(path):
    """Load a reference checkpoint -> (flat state_dict, epoch, meta dict).

    The flat state_dict maps dotted torch names (``base_net.stage2.0...``)
    to numpy arrays.
    """
    import torch

    with open(path, 'rb') as f:
        ckpt = torch.load(f, map_location='cpu', weights_only=False,
                          pickle_module=_make_pickle_module())

    epoch = 0
    meta = {}
    model = ckpt
    if isinstance(ckpt, dict):
        epoch = int(ckpt.get('epoch', 0))
        raw_meta = ckpt.get('meta', {})
        if isinstance(raw_meta, dict):
            meta = raw_meta
        model = ckpt.get('model', ckpt.get('state_dict', ckpt))

    if isinstance(model, _Stub):
        flat = {}
        _walk_module_stub(model, '', flat)
        return flat, epoch, meta, model
    if isinstance(model, dict):
        # plain state_dict
        flat = {k: _to_numpy(v) for k, v in model.items()
                if _is_tensor_like(v)}
        return flat, epoch, meta, None
    raise ValueError(f'unrecognized checkpoint structure in {path}')


def _is_tensor_like(v):
    return hasattr(v, 'detach') or isinstance(v, np.ndarray)


def _to_numpy(v):
    if isinstance(v, np.ndarray):
        return v
    return v.detach().cpu().numpy()


def _walk_module_stub(stub, prefix, out):
    d = stub.__dict__
    for k, v in (d.get('_parameters') or {}).items():
        if v is not None and _is_tensor_like(v):
            out[prefix + k] = _to_numpy(v)
    for k, v in (d.get('_buffers') or {}).items():
        if v is not None and _is_tensor_like(v):
            out[prefix + k] = _to_numpy(v)
    for k, v in (d.get('_modules') or {}).items():
        if v is not None:
            _walk_module_stub(v, prefix + k + '.', out)


# ------------------------------------------------------------------
# head metas from a pickled reference model
# ------------------------------------------------------------------

_HEADMETA_BY_REF_NAME = {
    'Cif': headmeta.Cif,
    'Caf': headmeta.Caf,
    'CifDet': headmeta.CifDet,
    'TSingleImageCif': headmeta.TSingleImageCif,
    'TSingleImageCaf': headmeta.TSingleImageCaf,
    'Tcaf': headmeta.Tcaf,
}


def head_metas_from_stub(model_stub) -> List[headmeta.Base]:
    """Rebuild our headmeta dataclasses from the pickled reference heads."""
    metas = []
    head_nets = model_stub.__dict__.get('_modules', {}).get('head_nets')
    if head_nets is None:
        return metas
    for _, hn in sorted(head_nets.__dict__.get('_modules', {}).items(),
                        key=lambda kv: int(kv[0])):
        ref_meta = hn.__dict__.get('meta')
        if ref_meta is None:
            continue
        cls_name = type(ref_meta)._name.rsplit('.', 1)[-1] \
            if isinstance(ref_meta, _Stub) else type(ref_meta).__name__
        cls = _HEADMETA_BY_REF_NAME.get(cls_name)
        if cls is None:
            LOG.warning('unknown reference head meta %s', cls_name)
            continue
        kwargs = {}
        for f in dataclasses.fields(cls):
            if not f.init:
                continue
            if hasattr(ref_meta, f.name):
                value = getattr(ref_meta, f.name)
                if _is_tensor_like(value) and not isinstance(value, np.ndarray):
                    value = _to_numpy(value)
                kwargs[f.name] = value
        meta = cls(**kwargs)
        meta.upsample_stride = getattr(ref_meta, 'upsample_stride', 1)
        meta.base_stride = getattr(ref_meta, 'base_stride', meta.base_stride)
        meta.head_index = getattr(ref_meta, 'head_index', meta.head_index)
        metas.append(meta)
    return metas


# ------------------------------------------------------------------
# name maps: torch dotted names -> flax tree paths
# ------------------------------------------------------------------

def _set(tree, path, value):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


class _Mapper:
    def __init__(self, flat: Dict[str, np.ndarray], torch_prefix: str = ''):
        self.flat = flat
        self.prefix = torch_prefix
        self.params: dict = {}
        self.batch_stats: dict = {}
        self.used = set()

    def _get(self, name):
        full = self.prefix + name
        if full not in self.flat:
            raise KeyError(f'missing weight {full!r} in torch checkpoint')
        self.used.add(full)
        return self.flat[full]

    def conv(self, t_name: str, f_path: Tuple[str, ...], bias=False):
        w = self._get(t_name + '.weight')
        _set(self.params, f_path + ('kernel',), w.transpose(2, 3, 1, 0))
        if bias:
            _set(self.params, f_path + ('bias',), self._get(t_name + '.bias'))

    def bn(self, t_name: str, f_path: Tuple[str, ...]):
        _set(self.params, f_path + ('scale',), self._get(t_name + '.weight'))
        _set(self.params, f_path + ('bias',), self._get(t_name + '.bias'))
        _set(self.batch_stats, f_path + ('mean',),
             self._get(t_name + '.running_mean'))
        _set(self.batch_stats, f_path + ('var',),
             self._get(t_name + '.running_var'))
        self.used.add(self.prefix + t_name + '.num_batches_tracked')

    def cna(self, t_conv: str, t_bn: str, f_module: Tuple[str, ...]):
        """torch [conv, bn] pair -> our ConvNormAct module."""
        self.conv(t_conv, f_module + ('Conv_0',))
        self.bn(t_bn, f_module + ('BatchNorm_0',))


def _map_shufflenetv2k(m: _Mapper, stages_repeats, *, input_block=True,
                       input_conv2=False):
    """ShuffleNetV2K and original ShuffleNetV2 (same block layout,
    reference basenetworks.py:186-242 / torchvision InvertedResidual)."""
    if input_block:
        m.cna('input_block.0.0', 'input_block.0.1', ('ConvNormAct_0',))
        if input_conv2:
            m.cna('input_block.1.0', 'input_block.1.1', ('ConvNormAct_1',))
    else:
        # original ShuffleNetV2 wrapper keeps torchvision names
        # (basenetworks.py:36-56)
        m.cna('conv1.0', 'conv1.1', ('ConvNormAct_0',))

    block = 0
    for stage_i, repeats in enumerate(stages_repeats):
        t_stage = f'stage{stage_i + 2}'
        for i in range(repeats):
            f_block = (f'InvertedResidualK_{block}',)
            t = f'{t_stage}.{i}'
            if i == 0:
                m.cna(f'{t}.branch1.0', f'{t}.branch1.1',
                      f_block + ('ConvNormAct_0',))
                m.cna(f'{t}.branch1.2', f'{t}.branch1.3',
                      f_block + ('ConvNormAct_1',))
                m.cna(f'{t}.branch2.0', f'{t}.branch2.1',
                      f_block + ('ConvNormAct_2',))
                m.cna(f'{t}.branch2.3', f'{t}.branch2.4',
                      f_block + ('ConvNormAct_3',))
                m.cna(f'{t}.branch2.5', f'{t}.branch2.6',
                      f_block + ('ConvNormAct_4',))
            else:
                m.cna(f'{t}.branch2.0', f'{t}.branch2.1',
                      f_block + ('ConvNormAct_0',))
                m.cna(f'{t}.branch2.3', f'{t}.branch2.4',
                      f_block + ('ConvNormAct_1',))
                m.cna(f'{t}.branch2.5', f'{t}.branch2.6',
                      f_block + ('ConvNormAct_2',))
            block += 1

    conv5_f = 'ConvNormAct_2' if input_conv2 else 'ConvNormAct_1'
    m.cna('conv5.0', 'conv5.1', (conv5_f,))


def _map_resnet(m: _Mapper, layers, *, basic_block=False):
    """torchvision ResNet/ResNeXt re-wrapped by the reference
    (basenetworks.py:71-183: children -> input_block + block2..block5)."""
    m.conv('input_block.0', ('Conv_0',))
    m.bn('input_block.1', ('BatchNorm_0',))

    block = 0
    for block_i, repeats in enumerate(layers):
        t_block = f'block{block_i + 2}'
        for i in range(repeats):
            t = f'{t_block}.{i}'
            if basic_block:
                f = (f'BasicBlock_{block}',)
                m.cna(f'{t}.conv1', f'{t}.bn1', f + ('ConvNormAct_0',))
                m.cna(f'{t}.conv2', f'{t}.bn2', f + ('ConvNormAct_1',))
                if i == 0 and block_i > 0:
                    m.cna(f'{t}.downsample.0', f'{t}.downsample.1',
                          f + ('ConvNormAct_2',))
            else:
                f = (f'Bottleneck_{block}',)
                m.cna(f'{t}.conv1', f'{t}.bn1', f + ('ConvNormAct_0',))
                m.cna(f'{t}.conv2', f'{t}.bn2', f + ('ConvNormAct_1',))
                m.cna(f'{t}.conv3', f'{t}.bn3', f + ('ConvNormAct_2',))
                if i == 0:
                    m.cna(f'{t}.downsample.0', f'{t}.downsample.1',
                          f + ('ConvNormAct_3',))
            block += 1


def _map_mobilenetv2(m: _Mapper):
    """torchvision MobileNetV2 features, wrapped as ``backbone`` by the
    reference (basenetworks.py:408-418)."""
    from .basenetworks import MobileNetV2

    m.cna('backbone.0.0', 'backbone.0.1', ('ConvNormAct_0',))
    block = 0
    t_idx = 1
    for expand, _, repeats, _ in MobileNetV2.config:
        for _ in range(repeats):
            f = (f'InvertedResidualV2_{block}',)
            t = f'backbone.{t_idx}'
            if expand == 1:
                # [dw ConvBNAct, project conv, bn]
                m.cna(f'{t}.conv.0.0', f'{t}.conv.0.1', f + ('ConvNormAct_0',))
                m.conv(f'{t}.conv.1', f + ('ConvNormAct_1', 'Conv_0'))
                m.bn(f'{t}.conv.2', f + ('ConvNormAct_1', 'BatchNorm_0'))
            else:
                m.cna(f'{t}.conv.0.0', f'{t}.conv.0.1', f + ('ConvNormAct_0',))
                m.cna(f'{t}.conv.1.0', f'{t}.conv.1.1', f + ('ConvNormAct_1',))
                m.conv(f'{t}.conv.2', f + ('ConvNormAct_2', 'Conv_0'))
                m.bn(f'{t}.conv.3', f + ('ConvNormAct_2', 'BatchNorm_0'))
            block += 1
            t_idx += 1
    m.cna(f'backbone.{t_idx}.0', f'backbone.{t_idx}.1', ('ConvNormAct_1',))


def _map_mobilenetv3(m: _Mapper, variant: str):
    """torchvision MobileNetV3 features (reference basenetworks.py:432-448)."""
    from .basenetworks import MobileNetV3

    config = (MobileNetV3.config_large if variant == 'large'
              else MobileNetV3.config_small)
    m.cna('backbone.0.0', 'backbone.0.1', ('ConvNormAct_0',))
    in_features = 16
    for block, (kernel, hidden, features, use_se, use_hs, stride) in \
            enumerate(config):
        f = (f'InvertedResidualV3_{block}',)
        t = f'backbone.{block + 1}.block'
        cna_i = 0
        t_i = 0
        if hidden != in_features:
            m.cna(f'{t}.{t_i}.0', f'{t}.{t_i}.1', f + (f'ConvNormAct_{cna_i}',))
            cna_i += 1
            t_i += 1
        m.cna(f'{t}.{t_i}.0', f'{t}.{t_i}.1', f + (f'ConvNormAct_{cna_i}',))
        cna_i += 1
        t_i += 1
        if use_se:
            se = f + ('SqueezeExcite_0',)
            m.conv(f'{t}.{t_i}.fc1', se + ('Conv_0',), bias=True)
            m.conv(f'{t}.{t_i}.fc2', se + ('Conv_1',), bias=True)
            t_i += 1
        m.cna(f'{t}.{t_i}.0', f'{t}.{t_i}.1', f + (f'ConvNormAct_{cna_i}',))
        in_features = features
    last_t = f'backbone.{len(config) + 1}'
    m.cna(f'{last_t}.0', f'{last_t}.1', ('ConvNormAct_1',))


def _map_squeezenet(m: _Mapper):
    """torchvision SqueezeNet 1.1 features (reference basenetworks.py:461-488).

    All convs have biases and no batch norm."""
    m.conv('backbone.0', ('Conv_0',), bias=True)
    fire_t = (3, 4, 6, 7, 9, 10, 11, 12)
    for i, t_idx in enumerate(fire_t):
        f = (f'Fire_{i}',)
        m.conv(f'backbone.{t_idx}.squeeze', f + ('Conv_0',), bias=True)
        m.conv(f'backbone.{t_idx}.expand1x1', f + ('Conv_1',), bias=True)
        m.conv(f'backbone.{t_idx}.expand3x3', f + ('Conv_2',), bias=True)


_SHUFFLENET_REPEATS = {
    'shufflenetv2k16': [4, 8, 4],
    'shufflenetv2k20': [5, 10, 5],
    'shufflenetv2kx5': [6, 13, 6],
    'shufflenetv2k30': [8, 16, 6],
    'shufflenetv2k44': [12, 24, 8],
    'shufflenetv2x1': [4, 8, 4],
    'shufflenetv2x2': [4, 8, 4],
}

_RESNET_LAYERS = {
    'resnet18': ((2, 2, 2, 2), True),
    'resnet50': ((3, 4, 6, 3), False),
    'resnet101': ((3, 4, 23, 3), False),
    'resnet152': ((3, 8, 36, 3), False),
    'resnext50': ((3, 4, 6, 3), False),
    'resnext101': ((3, 4, 23, 3), False),
}


def convert_base_net(flat: Dict[str, np.ndarray], base_name: str,
                     torch_prefix: str = 'base_net.'):
    """Convert the backbone weights -> (params, batch_stats) subtrees."""
    name = base_name[1:] if base_name.startswith('t') else base_name
    m = _Mapper(flat, torch_prefix)
    if name in _SHUFFLENET_REPEATS:
        _map_shufflenetv2k(
            m, _SHUFFLENET_REPEATS[name],
            input_block=not name.startswith('shufflenetv2x'),
            input_conv2=any(k.startswith(torch_prefix + 'input_block.1.')
                            for k in flat))
    elif name in _RESNET_LAYERS:
        layers, basic = _RESNET_LAYERS[name]
        _map_resnet(m, layers, basic_block=basic)
    elif name == 'mobilenetv2':
        _map_mobilenetv2(m)
    elif name in ('mobilenetv3large', 'mobilenetv3small'):
        _map_mobilenetv3(m, name.replace('mobilenetv3', ''))
    elif name == 'squeezenet':
        _map_squeezenet(m)
    else:
        raise NotImplementedError(
            f'no torch conversion map for backbone {base_name!r}')
    return m.params, m.batch_stats, m.used


def convert_tracking_heads(flat: Dict[str, np.ndarray]):
    """TBaseSingleImage (head.conv) and Tcaf (feature_reduction/compute +
    head.conv) heads of tracking checkpoints
    (reference network/tracking_heads.py:6-103)."""
    params = {}
    used = set()
    i = 0
    while True:
        t = f'head_nets.{i}'
        if f'{t}.head.conv.weight' not in flat:
            break
        head = {}
        if f'{t}.feature_reduction.0.weight' in flat:
            for t_name, f_name in (('feature_reduction', 'feature_reduction'),
                                   ('feature_compute', 'feature_compute')):
                w = flat[f'{t}.{t_name}.0.weight']
                b = flat[f'{t}.{t_name}.0.bias']
                head[f_name] = {'kernel': w.transpose(2, 3, 1, 0), 'bias': b}
                used.update({f'{t}.{t_name}.0.weight', f'{t}.{t_name}.0.bias'})
        w = flat[f'{t}.head.conv.weight']
        b = flat[f'{t}.head.conv.bias']
        head['CompositeField4_0'] = {'Conv_0': {
            'kernel': w.transpose(2, 3, 1, 0), 'bias': b}}
        used.update({f'{t}.head.conv.weight', f'{t}.head.conv.bias'})
        params[f'head_nets_{i}'] = head
        i += 1
    return params, used


def head_types_from_stub(model_stub) -> List[str]:
    """Head module class names from a pickled reference model
    (e.g. 'CompositeField4', 'CompositeField3')."""
    types = []
    if model_stub is None:
        return types
    head_nets = model_stub.__dict__.get('_modules', {}).get('head_nets')
    if head_nets is None:
        return types
    for _, hn in sorted(head_nets.__dict__.get('_modules', {}).items(),
                        key=lambda kv: int(kv[0])):
        name = type(hn)._name.rsplit('.', 1)[-1] \
            if isinstance(hn, _Stub) else type(hn).__name__
        types.append(name)
    return types


def _cf3_to_cf4_channels(w, b, meta):
    """Reorder a CompositeField3 conv's output channels into the
    CompositeField4 layout.

    CF3 per-field channels: [conf (n_c), vectors (2*n_v), logb (n_v),
    scales (n_s)] (reference heads.py:144, CompositeField3.forward).
    CF4 per-field channels: [b (1), conf, vectors, scales]. The v4-style
    output keeps only the FIRST logb channel — exactly what CF3's own
    inference emits via the "v4 style" concat (heads.py:255-262).
    """
    n_c = meta.n_confidences
    n_v = meta.n_vectors
    n_s = meta.n_scales
    c3 = n_c + 3 * n_v + n_s
    c4 = 1 + n_c + 2 * n_v + n_s
    ups2 = meta.upsample_stride ** 2
    n_fields = w.shape[0] // (c3 * ups2)
    assert n_fields * c3 * ups2 == w.shape[0], \
        (w.shape, n_fields, c3, ups2)

    # CF4 order indices into the CF3 component axis
    order = ([n_c + 2 * n_v]                       # first logb -> b
             + list(range(n_c))                    # confidences
             + list(range(n_c, n_c + 2 * n_v))     # vectors
             + list(range(n_c + 3 * n_v, c3)))     # scales
    assert len(order) == c4

    def reorder(arr):
        shaped = arr.reshape(n_fields, c3, ups2, *arr.shape[1:])
        return shaped[:, order].reshape(n_fields * c4 * ups2,
                                        *arr.shape[1:])

    return reorder(w), reorder(b)


def convert_heads(flat: Dict[str, np.ndarray], *, head_types=None,
                  head_metas=None):
    """CompositeField4/3 heads: head_nets.{i}.conv -> head_nets_{i}.Conv_0.

    CompositeField3 convs are channel-permuted into the CF4 layout
    (v4-style, matching the reference's own CF3 inference output)."""
    params = {}
    used = set()
    i = 0
    while f'head_nets.{i}.conv.weight' in flat:
        w = flat[f'head_nets.{i}.conv.weight']
        b = flat[f'head_nets.{i}.conv.bias']
        if (head_types is not None and i < len(head_types)
                and head_types[i] == 'CompositeField3'):
            assert head_metas is not None and i < len(head_metas)
            w, b = _cf3_to_cf4_channels(w, b, head_metas[i])
            LOG.info('head %d: CompositeField3 -> CF4 channel layout', i)
        params[f'head_nets_{i}'] = {'Conv_0': {
            'kernel': w.transpose(2, 3, 1, 0), 'bias': b}}
        used.update({f'head_nets.{i}.conv.weight',
                     f'head_nets.{i}.conv.bias'})
        i += 1
    return params, used


def detect_base_name(flat: Dict[str, np.ndarray], meta: dict) -> str:
    """Infer the backbone name from checkpoint metadata or weight shapes."""
    args = meta.get('args') if isinstance(meta, dict) else None
    basenet = None
    if args is not None:
        basenet = getattr(args, 'basenet', None) or \
            (args.get('basenet') if isinstance(args, dict) else None)
        if not basenet:
            ckpt_name = getattr(args, 'checkpoint', None) or \
                (args.get('checkpoint') if isinstance(args, dict) else None)
            if ckpt_name and str(ckpt_name) in set(_SHUFFLENET_REPEATS) | set(_RESNET_LAYERS):
                basenet = str(ckpt_name)
    if basenet:
        return str(basenet)

    # shape-based detection
    if 'base_net.conv5.0.weight' in flat or \
            any(k.endswith('conv5.0.weight') for k in flat):
        stage2 = [k for k in flat if '.stage2.' in k]
        n2 = 1 + max(int(k.split('.stage2.')[1].split('.')[0]) for k in stage2)
        ch = None
        for k in flat:
            if k.endswith('stage2.0.branch1.2.weight'):
                ch = flat[k].shape[0] * 2
        for name, repeats in _SHUFFLENET_REPEATS.items():
            if repeats[0] != n2:
                continue
            from . import factory as models_factory
            net = models_factory.BASE_FACTORIES[name]()
            if ch is None or net.stages_out_channels[1] == ch:
                return name
    if any(k.endswith('backbone.3.squeeze.weight') for k in flat):
        return 'squeezenet'
    if any('.block.' in k and 'backbone.' in k for k in flat):
        return ('mobilenetv3large'
                if any(k.endswith('backbone.16.0.weight') for k in flat)
                else 'mobilenetv3small')
    if any(k.endswith('backbone.18.0.weight') for k in flat):
        return 'mobilenetv2'
    if any('.block2.' in k for k in flat):
        n4 = 1 + max(int(k.split('.block4.')[1].split('.')[0])
                     for k in flat if '.block4.' in k)
        basic = not any('.conv3.' in k for k in flat)
        if basic:
            return 'resnet18'
        grouped = any(k.endswith('block2.0.conv2.weight')
                      and flat[k].shape[1] != flat[k].shape[0]
                      for k in flat)
        by_n4 = {6: 'resnext50' if grouped else 'resnet50',
                 23: 'resnext101' if grouped else 'resnet101',
                 36: 'resnet152'}
        if n4 in by_n4:
            return by_n4[n4]
    raise ValueError('could not detect backbone architecture; '
                     'pass --base-name explicitly')


def convert_checkpoint(torch_path: str, *, base_name: str = None,
                       head_metas: List[headmeta.Base] = None):
    """Full conversion: reference checkpoint file -> (base_name, head_metas,
    variables) ready for ``training.checkpoint.save_shell``."""
    flat, epoch, meta, model_stub = load_torch_checkpoint(torch_path)

    tracking = any(k.startswith('base_net.single_image_backbone.')
                   for k in flat)
    base_prefix = ('base_net.single_image_backbone.' if tracking
                   else 'base_net.')

    if base_name is None:
        base_name = detect_base_name(flat, meta)
        if tracking and not base_name.startswith('t'):
            base_name = 't' + base_name
    # the pickled model's own metas describe the checkpoint's heads; any
    # caller-supplied head_metas are only a fallback for bare state_dicts
    if model_stub is not None:
        stub_metas = head_metas_from_stub(model_stub)
        if stub_metas:
            head_metas = stub_metas
    if not head_metas:
        raise ValueError('checkpoint has no recoverable head metas; '
                         'pass head_metas explicitly (e.g. via --dataset)')

    params, batch_stats, used = convert_base_net(
        flat, base_name, torch_prefix=base_prefix)
    if tracking:
        head_params, head_used = convert_tracking_heads(flat)
    else:
        head_params, head_used = convert_heads(
            flat, head_types=head_types_from_stub(model_stub),
            head_metas=head_metas)
    used |= head_used

    variables = {
        'params': {'base_net': params, **head_params},
        'batch_stats': {'base_net': batch_stats},
    }

    unused = [k for k in flat
              if k not in used and not k.endswith('num_batches_tracked')
              and '.flip_indices' not in k and '.reverse_direction' not in k]
    if unused:
        LOG.warning('unconverted torch weights: %s',
                    unused[:10] + (['...'] if len(unused) > 10 else []))
    return base_name, head_metas, variables, epoch
