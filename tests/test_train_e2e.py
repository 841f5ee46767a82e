"""End-to-end training smoke test on the reference's tiny COCO fixture
(reference ``tests/test_train.py:6-49``), followed by checkpoint load and
prediction with the trained model."""

import os
import subprocess
import sys
import types

import jax
import numpy as np
import pytest

import openpifpaf_tpu
from openpifpaf_tpu.models import factory as models_factory
from openpifpaf_tpu.plugins.coco.cocokp import CocoKp
from openpifpaf_tpu.training import checkpoint as ckpt_mod
from openpifpaf_tpu.training import losses, optimize
from openpifpaf_tpu.training.trainer import Trainer

FIXTURE_ANN = '/root/reference/tests/coco/train1.json'
FIXTURE_IMAGES = '/root/reference/tests/coco/images'

requires_fixture = pytest.mark.skipif(
    not os.path.exists(FIXTURE_ANN), reason='reference fixture not available')


@requires_fixture
def test_train_one_epoch(tmp_path):
    datamodule = CocoKp(
        train_annotations=FIXTURE_ANN,
        val_annotations=FIXTURE_ANN,
        train_image_dir=FIXTURE_IMAGES,
        val_image_dir=FIXTURE_IMAGES,
        square_edge=161,
    )
    datamodule.batch_size = 1

    net_factory = models_factory.Factory(base_name='resnet18')
    model, init_fn = net_factory.from_scratch(datamodule.head_metas)
    variables = init_fn(jax.random.PRNGKey(0), (1, 161, 161, 3))

    loss_fn = losses.Factory().factory(datamodule.head_metas)
    args = types.SimpleNamespace(
        momentum=0.9, beta2=0.999, adam_eps=1e-6, nesterov=True,
        weight_decay=0.0, adam=False, amsgrad=False,
        lr=1e-4, lr_decay=[], lr_decay_factor=0.1, lr_decay_epochs=1.0,
        lr_warm_up_start_epoch=0, lr_warm_up_epochs=1,
        lr_warm_up_factor=0.001, lr_warm_restarts=[],
        lr_warm_restart_duration=0.5)
    optimizer, schedule = optimize.factory_optimizer(
        args, training_batches_per_epoch=1)

    out = str(tmp_path / 'model')
    trainer = Trainer(model, loss_fn, optimizer, schedule, out,
                      variables=variables,
                      model_meta_data={
                          'base_name': 'resnet18',
                          'head_metas': [ckpt_mod.headmeta_to_dict(m)
                                         for m in datamodule.head_metas],
                      })
    trainer.epochs = 1
    trainer.loop(datamodule.train_loader(), datamodule.val_loader())

    assert os.path.exists(out + '.json')
    assert os.path.exists(out + '.arrays')

    # reload and run a forward pass through the Predictor
    model2, variables2 = ckpt_mod.load_shell(out)
    predictor = openpifpaf_tpu.Predictor(model=model2, variables=variables2)
    predictor.long_edge = 161
    predictor.preprocess = predictor._build_preprocess()
    pred, _, meta = predictor.image(
        os.path.join(FIXTURE_IMAGES, 'puppy_dog.jpg'))
    assert isinstance(pred, list)
    assert meta['file_name'].endswith('puppy_dog.jpg')


PYTHON = sys.executable
ENV = dict(os.environ, JAX_PLATFORMS='cpu', PYTHONPATH=os.getcwd())


@pytest.mark.slow
def test_train_multidataset(tmp_path):
    """MultiDataModule training (reference 'cocokp-crowdpose' hyphen
    syntax, datasets/factory.py:5-15): weighted round-robin MultiLoader
    with per-dataset targets mapped into global head slots."""
    out = str(tmp_path / 'multi')
    ann = '/root/reference/tests/coco/train1.json'
    img_dir = '/root/reference/tests/coco/images'
    result = subprocess.run(
        [PYTHON, '-m', 'openpifpaf_tpu.train', '--dataset', 'cocokp-cocodet',
         '--cocokp-train-annotations', ann,
         '--cocokp-val-annotations', ann,
         '--cocokp-train-image-dir', img_dir,
         '--cocokp-val-image-dir', img_dir,
         '--cocodet-train-annotations', ann,
         '--cocodet-val-annotations', ann,
         '--cocodet-train-image-dir', img_dir,
         '--cocodet-val-image-dir', img_dir,
         '--cocokp-square-edge', '97', '--cocodet-square-edge', '97',
         '--basenet', 'resnet18', '--batch-size', '1', '--n-devices', '1',
         '--epochs', '1', '--lr', '1e-4', '--output', out],
        env=ENV, capture_output=True, timeout=900)
    assert result.returncode == 0, result.stderr.decode()[-2000:]
    assert os.path.exists(out + '.json')
    import json
    meta = json.load(open(out + '.json'))
    # three global heads: cocokp cif+caf and cocodet cifdet
    assert len(meta['head_metas']) == 3
