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


def load_shell(path, *, head_metas=None):
    """Rebuild a Shell model + variables from a checkpoint.

    Returns (model, variables). If head_metas is provided, they are used for
    consolidation (head order must match the checkpoint for now).
    """
    from ..models import factory as models_factory
    from ..models.shell import Shell

    arrays, meta = load(path)
    ckpt_metas = [headmeta_from_dict(d) for d in meta['head_metas']]
    metas = ckpt_metas if head_metas is None else head_metas

    base_net = models_factory.BASE_FACTORIES[meta['base_name']]()
    for m, ckpt_m in zip(metas, ckpt_metas):
        m.head_index = ckpt_m.head_index
        m.base_stride = ckpt_m.base_stride
        m.upsample_stride = ckpt_m.upsample_stride
    head_nets = tuple(models_factory.HEADS[type(m)](meta=m) for m in metas)
    model = Shell(base_net=base_net, head_nets=head_nets)
    variables = {'params': arrays['params'],
                 'batch_stats': arrays['batch_stats']}
    return model, variables


def file_hash(path):
    sha = hashlib.sha256()
    with open(path, 'rb') as f:
        for chunk in iter(lambda: f.read(1 << 20), b''):
            sha.update(chunk)
    return sha.hexdigest()
