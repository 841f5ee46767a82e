"""Checkpointing: orbax pytree checkpoints + head-meta JSON.

Reference checkpoints pickle the whole nn.Module (trainer.py:410-425);
here a checkpoint is a directory with the params/batch_stats pytrees
(orbax) and a JSON description (base net name, head metas, version) from
which the Shell is reconstructed.
"""

import dataclasses
import hashlib
import json
import logging
import os

import jax
import numpy as np

from .. import headmeta

LOG = logging.getLogger(__name__)

#: meta dict of the checkpoint most recently loaded by load_shell
#: (base_name, epoch, backbone_options, ...) — lets callers (train resume)
#: reuse it without re-reading or re-converting
LAST_META = None

HEADMETA_CLASSES = {
    cls.__name__: cls
    for cls in (headmeta.Cif, headmeta.Caf, headmeta.CifDet,
                headmeta.TSingleImageCif, headmeta.TSingleImageCaf,
                headmeta.Tcaf)
}


def headmeta_to_dict(meta):
    d = {'__class__': type(meta).__name__}
    for f in dataclasses.fields(meta):
        value = getattr(meta, f.name)
        if isinstance(value, np.ndarray):
            value = {'__ndarray__': value.tolist()}
        d[f.name] = value
    d['head_index'] = meta.head_index
    d['base_stride'] = meta.base_stride
    d['upsample_stride'] = meta.upsample_stride
    return d


def headmeta_from_dict(d):
    d = dict(d)
    cls = HEADMETA_CLASSES[d.pop('__class__')]
    head_index = d.pop('head_index', None)
    base_stride = d.pop('base_stride', None)
    upsample_stride = d.pop('upsample_stride', 1)
    init_fields = {f.name for f in dataclasses.fields(cls) if f.init}
    kwargs = {}
    for k, v in d.items():
        if k not in init_fields:
            continue
        if isinstance(v, dict) and '__ndarray__' in v:
            v = np.asarray(v['__ndarray__'])
        kwargs[k] = v
    meta = cls(**kwargs)
    meta.head_index = head_index
    meta.base_stride = base_stride
    meta.upsample_stride = upsample_stride
    return meta


def save(path, *, params, batch_stats, meta):
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    checkpointer = ocp.StandardCheckpointer()
    arrays_path = path + '.arrays'
    if os.path.exists(arrays_path):
        import shutil
        shutil.rmtree(arrays_path)
    checkpointer.save(
        arrays_path,
        {'params': jax.device_get(params),
         'batch_stats': jax.device_get(batch_stats)})
    checkpointer.wait_until_finished()

    with open(path + '.json', 'w') as f:
        json.dump(meta, f)


def load(path):
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with open(path + '.json', 'r') as f:
        meta = json.load(f)

    checkpointer = ocp.StandardCheckpointer()
    arrays = checkpointer.restore(path + '.arrays')
    return arrays, meta


def save_shell(path, *, base_name, head_metas, params, batch_stats,
               epoch=0, extra_meta=None):
    meta = {
        'base_name': base_name,
        'head_metas': [headmeta_to_dict(m) for m in head_metas],
        'epoch': epoch,
        'version': '0.1.0',
    }
    if extra_meta:
        meta.update(extra_meta)
    save(path, params=params, batch_stats=batch_stats, meta=meta)


def load_shell(path, *, head_metas=None, head_consolidation='filter_and_extend'):
    """Rebuild a Shell model + variables from a checkpoint.

    head_consolidation (reference network/factory.py:198-234):
      'keep' — ignore the requested head_metas, use the checkpoint's heads;
      'create' — all requested heads freshly initialized;
      'filter_and_extend' — reuse checkpoint weights for requested heads
        that match by (dataset, name), initialize the rest.
    """
    import jax

    from ..models import factory as models_factory
    from ..models.shell import Shell

    global LAST_META

    if os.path.isfile(path) and not os.path.exists(path + '.json'):
        # a single file is a reference (PyTorch) checkpoint: convert in place
        from ..models import convert_torch
        base_name, ckpt_metas, variables, epoch = \
            convert_torch.convert_checkpoint(path, head_metas=head_metas)
        arrays = {'params': variables['params'],
                  'batch_stats': variables['batch_stats']}
        meta = {'base_name': base_name, 'epoch': epoch,
                'head_metas': [headmeta_to_dict(m) for m in ckpt_metas]}
    else:
        arrays, meta = load(path)
        ckpt_metas = [headmeta_from_dict(d) for d in meta['head_metas']]
    LAST_META = meta

    # models trained with backbone surgery flags (--shufflenetv2k-*,
    # --resnet-*) record the options; apply them only while building so the
    # rebuilt architecture matches the stored parameter tree — the flax
    # modules bind their options at construction, so the globals can be
    # restored afterwards without affecting the returned model
    _option_targets = {'shufflenetv2k': models_factory.SHUFFLENETV2K_OPTIONS,
                       'resnet': models_factory.RESNET_OPTIONS}
    _option_snapshot = {k: dict(v) for k, v in _option_targets.items()}
    for family, options in (meta.get('backbone_options') or {}).items():
        target = _option_targets.get(family)
        if target is not None:
            target.update(options)

    def build(metas, base_stride_from=None):
        base_net = models_factory.BASE_FACTORIES[meta['base_name']]()
        for i, m in enumerate(metas):
            m.head_index = i
            m.base_stride = base_net.stride
        tracking = any(
            isinstance(m, (headmeta.Tcaf, headmeta.TSingleImageCif,
                           headmeta.TSingleImageCaf)) for m in metas)
        if tracking:
            from ..models.tracking import (TrackingShell, TBaseSingleImage,
                                           Tcaf as TcafHead)
            head_nets = tuple(
                TcafHead(meta=m) if isinstance(m, headmeta.Tcaf)
                else TBaseSingleImage(meta=m) for m in metas)
            return TrackingShell(base_net=base_net, head_nets=head_nets)
        head_nets = tuple(
            models_factory.HEADS[type(m)](meta=m) for m in metas)
        return Shell(base_net=base_net, head_nets=head_nets)

    def _restore_options():
        for k, snap in _option_snapshot.items():
            _option_targets[k].clear()
            _option_targets[k].update(snap)

    if head_metas is None or head_consolidation == 'keep':
        model = build(ckpt_metas)
        _restore_options()
        variables = {'params': arrays['params'],
                     'batch_stats': arrays['batch_stats']}
        return model, variables

    model = build(head_metas)
    _restore_options()
    import jax.numpy as jnp
    dummy = jnp.zeros((1, 97, 129, 3), dtype=jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), dummy, train=True)
    variables = jax.tree_util.tree_map(lambda x: x, variables)  # unfreeze copy

    params = dict(variables['params'])
    batch_stats = dict(variables.get('batch_stats', {}))
    params['base_net'] = arrays['params']['base_net']
    if 'base_net' in arrays['batch_stats']:
        batch_stats['base_net'] = arrays['batch_stats']['base_net']

    if head_consolidation == 'filter_and_extend':
        ckpt_by_key = {(m.dataset, m.name): i
                       for i, m in enumerate(ckpt_metas)}
        for i, m in enumerate(head_metas):
            ckpt_i = ckpt_by_key.get((m.dataset, m.name))
            if ckpt_i is None:
                LOG.info('initializing new head %s.%s', m.dataset, m.name)
                continue
            src = f'head_nets_{ckpt_i}'
            dst = f'head_nets_{i}'
            if src in arrays['params']:
                params[dst] = arrays['params'][src]
            if src in arrays['batch_stats']:
                batch_stats[dst] = arrays['batch_stats'][src]
    elif head_consolidation != 'create':
        raise ValueError(f'unknown head consolidation {head_consolidation}')

    return model, {'params': params, 'batch_stats': batch_stats}


def file_hash(path):
    sha = hashlib.sha256()
    with open(path, 'rb') as f:
        for chunk in iter(lambda: f.read(1 << 20), b''):
            sha.update(chunk)
    return sha.hexdigest()
