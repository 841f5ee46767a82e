"""Numeric parity of the torch->flax checkpoint converter.

Reference-layout torch models (tests/torch_ref.py) are pickled exactly the
way the reference saves checkpoints (whole module:
``network/trainer.py:410-414``); conversion must reproduce the forward pass
bit-closely in both eval mode (running batch stats) and train mode (batch
statistics), proving weight layout, naming and BN translation are right.
"""

import argparse

import jax
import numpy as np
import pytest
import torch

import torch_ref
from openpifpaf_tpu.models import convert_torch, factory as models_factory
from openpifpaf_tpu.models.shell import Shell, assign_strides


def _save_reference_style(tmp_path, shell, base_name):
    path = str(tmp_path / 'ref_ckpt.pkl')
    torch.save({
        'model': shell,
        'epoch': 3,
        'meta': {'args': argparse.Namespace(basenet=base_name)},
    }, path)
    return path


def _flax_model(base_name, head_metas):
    base_net = models_factory.BASE_FACTORIES[base_name]()
    assign_strides(head_metas, base_net.stride)
    head_nets = tuple(models_factory.HEADS[type(m)](meta=m)
                      for m in head_metas)
    return Shell(base_net=base_net, head_nets=head_nets)


@pytest.mark.parametrize('base_name', ['shufflenetv2k16', 'resnet18',
                                       'resnet50', 'resnext50',
                                       'mobilenetv2', 'mobilenetv3large',
                                       'mobilenetv3small', 'squeezenet'])
def test_forward_parity(tmp_path, base_name):
    torch.manual_seed(42)
    shell_t = torch_ref.build_shell(base_name)
    torch_ref.randomize_batch_norm_stats(shell_t)
    shell_t.eval()

    path = _save_reference_style(tmp_path, shell_t, base_name)
    detected, head_metas, variables, epoch = \
        convert_torch.convert_checkpoint(path)
    assert detected == base_name
    assert epoch == 3
    assert [type(m).__name__ for m in head_metas] == ['Cif', 'Caf']
    assert head_metas[0].n_fields == 17
    assert head_metas[1].n_fields == 19

    model_f = _flax_model(base_name, head_metas)

    rng = np.random.RandomState(7)
    img = rng.randn(1, 3, 65, 97).astype(np.float32)

    with torch.no_grad():
        cif_t, caf_t = shell_t(torch.from_numpy(img))

    # train=True returns the raw (B,F,C,H,W) field layout like the torch
    # fixture, but uses batch statistics; run the base net in eval mode and
    # apply heads manually for an eval-mode raw comparison instead.
    feats = model_f.base_net.apply(
        {'params': variables['params']['base_net'],
         'batch_stats': variables['batch_stats']['base_net']},
        img.transpose(0, 2, 3, 1), train=False)
    for i, (torch_out, meta) in enumerate(zip((cif_t, caf_t), head_metas)):
        head = model_f.head_nets[i]
        out = head.apply(
            {'params': variables['params'][f'head_nets_{i}']},
            feats, train=True)
        np.testing.assert_allclose(np.asarray(out), torch_out.numpy(),
                                   rtol=1e-3, atol=1e-3)


def test_train_mode_parity(tmp_path):
    """Batch-statistics path: torch train() vs flax train=True."""
    torch.manual_seed(1)
    shell_t = torch_ref.build_shell('resnet18')
    shell_t.train()

    path = _save_reference_style(tmp_path, shell_t, 'resnet18')
    _, head_metas, variables, _ = convert_torch.convert_checkpoint(path)
    model_f = _flax_model('resnet18', head_metas)

    rng = np.random.RandomState(3)
    img = rng.randn(2, 3, 65, 65).astype(np.float32)
    with torch.no_grad():
        cif_t, _ = shell_t(torch.from_numpy(img))

    (cif_f, _), _ = model_f.apply(
        variables, img.transpose(0, 2, 3, 1), train=True,
        mutable=['batch_stats'])
    np.testing.assert_allclose(np.asarray(cif_f), cif_t.numpy(),
                               rtol=1e-3, atol=1e-3)


def test_state_dict_only_checkpoint(tmp_path):
    """Plain state_dict checkpoints convert too (base name detection from
    weight shapes, heads passed explicitly)."""
    torch.manual_seed(0)
    shell_t = torch_ref.build_shell('shufflenetv2k16')
    path = str(tmp_path / 'sd.pkl')
    torch.save({'model': shell_t.state_dict(), 'epoch': 1, 'meta': {}}, path)

    import openpifpaf_tpu
    datamodule = openpifpaf_tpu.datasets.factory('cocokp')
    base_name, head_metas, variables, _ = convert_torch.convert_checkpoint(
        path, head_metas=datamodule.head_metas)
    assert base_name == 'shufflenetv2k16'
    kernel = variables['params']['base_net']['ConvNormAct_0']['Conv_0']['kernel']
    assert kernel.shape == (3, 3, 3, 24)


def test_converted_checkpoint_roundtrip(tmp_path):
    """Converted checkpoint saves via training.checkpoint and reloads as a
    working Shell (the migrate CLI path)."""
    from openpifpaf_tpu.training import checkpoint as ckpt_mod

    torch.manual_seed(5)
    shell_t = torch_ref.build_shell('resnet18')
    path = _save_reference_style(tmp_path, shell_t, 'resnet18')
    base_name, head_metas, variables, epoch = \
        convert_torch.convert_checkpoint(path)

    out = str(tmp_path / 'converted')
    ckpt_mod.save_shell(out, base_name=base_name, head_metas=head_metas,
                        params=variables['params'],
                        batch_stats=variables['batch_stats'], epoch=epoch)
    model, restored = ckpt_mod.load_shell(out)
    fields = model.apply(
        {'params': restored['params'],
         'batch_stats': restored['batch_stats']},
        np.zeros((1, 65, 65, 3), np.float32), train=False)
    assert fields[0].shape == (1, 17, 5, 5, 5)
    assert fields[1].shape == (1, 19, 8, 5, 5)


@pytest.mark.parametrize('base_name', ['mobilenetv2', 'mobilenetv3large',
                                       'mobilenetv3small', 'squeezenet',
                                       'resnext50'])
def test_detect_base_name_from_shapes(tmp_path, base_name):
    """Backbone detection works without checkpoint metadata."""
    torch.manual_seed(0)
    shell_t = torch_ref.build_shell(base_name)
    path = str(tmp_path / 'ckpt.pkl')
    torch.save({'model': shell_t, 'epoch': 0, 'meta': {}}, path)
    detected, _, _, _ = convert_torch.convert_checkpoint(path)
    assert detected == base_name


def test_tracking_checkpoint_conversion(tmp_path):
    """tshufflenetv2k tracking checkpoints (TrackingBase wrapper +
    TBaseSingleImage/Tcaf heads) convert and forward-match in train mode."""
    torch.manual_seed(11)
    shell_t = torch_ref.build_tracking_shell()
    shell_t.train()
    path = str(tmp_path / 'tracking.pkl')
    torch.save({'model': shell_t, 'epoch': 2, 'meta': {}}, path)

    base_name, head_metas, variables, _ = \
        convert_torch.convert_checkpoint(path)
    assert base_name == 'tshufflenetv2k16'
    assert [type(m).__name__ for m in head_metas] == \
        ['TSingleImageCif', 'TSingleImageCaf', 'Tcaf']

    from openpifpaf_tpu.models.tracking import (TrackingShell,
                                                TBaseSingleImage,
                                                Tcaf as TcafHead)
    from openpifpaf_tpu import headmeta
    base_net = models_factory.BASE_FACTORIES[base_name]()
    assign_strides(head_metas, base_net.stride)
    head_nets = tuple(
        TcafHead(meta=m) if isinstance(m, headmeta.Tcaf)
        else TBaseSingleImage(meta=m) for m in head_metas)
    model_f = TrackingShell(base_net=base_net, head_nets=head_nets)

    rng = np.random.RandomState(2)
    imgs = rng.randn(2, 3, 65, 65).astype(np.float32)  # one frame pair
    with torch.no_grad():
        cif_t, caf_t, tcaf_t = shell_t(torch.from_numpy(imgs))

    (cif_f, caf_f, tcaf_f), _ = model_f.apply(
        variables, imgs.transpose(0, 2, 3, 1), train=True,
        mutable=['batch_stats'])
    np.testing.assert_allclose(np.asarray(cif_f), cif_t.numpy(),
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(caf_f), caf_t.numpy(),
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(tcaf_f), tcaf_t.numpy(),
                               rtol=1e-3, atol=1e-3)


def test_cf3_head_conversion(tmp_path):
    """CompositeField3 checkpoints convert to the CF4 channel layout and
    reproduce the reference's own v4-style inference output."""
    torch.manual_seed(7)
    shell_t = torch_ref.build_shell(
        'resnet18', head_cls=torch_ref.CompositeField3)
    torch_ref.randomize_batch_norm_stats(shell_t)
    shell_t.eval()

    path = _save_reference_style(tmp_path, shell_t, 'resnet18')
    detected, head_metas, variables, _ = \
        convert_torch.convert_checkpoint(path)
    assert detected == 'resnet18'

    model_f = _flax_model('resnet18', head_metas)

    rng = np.random.RandomState(3)
    img = rng.randn(1, 3, 65, 97).astype(np.float32)

    with torch.no_grad():
        feats_t = shell_t.base_net(torch.from_numpy(img))
        ref_out = [hn.forward_inference_v4(feats_t).numpy()
                   for hn in shell_t.head_nets]

    out = model_f.apply(variables, img.transpose(0, 2, 3, 1), train=False)
    for ours, ref, meta in zip(out, ref_out, head_metas):
        ours = np.asarray(ours)
        assert ours.shape == ref.shape
        np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-2)
