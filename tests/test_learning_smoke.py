"""Fast learning-validation smoke in the default suite.

The full overfit-to-AP-0.90 loop stays behind RUN_SLOW
(tests/test_overfit.py); this test catches a broken losses/optimizer/
encoder pipeline in ~2 minutes: overfit one real fixture batch (the
reference's tests/coco/train1.json image through the real CocoKp
preprocessing + Cif/Caf encoders) for a few dozen steps and assert

1. the composite loss drops by a large margin, and
2. the model's CIF confidence plane localizes ground-truth keypoints
   (argmax within a couple of cells), i.e. the gradients point at the
   annotated person, not just at a shrinking background term.

This is the cheap analogue of the reference's 1-epoch
``tests/test_train.py`` train-then-predict check.
"""

import os
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from openpifpaf_tpu.models import factory as models_factory
from openpifpaf_tpu.plugins.coco.cocokp import CocoKp
from openpifpaf_tpu.training import losses, optimize
from openpifpaf_tpu.training.trainer import (TrainState, build_train_step,
                                             make_mesh)

FIXTURE_ANN = '/root/reference/tests/coco/train1.json'
FIXTURE_IMAGES = '/root/reference/tests/coco/images'

requires_fixture = pytest.mark.skipif(
    not os.path.exists(FIXTURE_ANN), reason='reference fixture not available')


@requires_fixture
def test_loss_decreases_and_cif_localizes():
    datamodule = CocoKp(
        train_annotations=FIXTURE_ANN,
        val_annotations=FIXTURE_ANN,
        train_image_dir=FIXTURE_IMAGES,
        val_image_dir=FIXTURE_IMAGES,
        square_edge=97,
    )
    datamodule.batch_size = 1
    datamodule.augmentation = False  # deterministic single batch

    # model first: the factory assigns head_metas' base_stride, which the
    # encoders need (same ordering contract as the reference train.py)
    net_factory = models_factory.Factory(base_name='resnet18')
    model, init_fn = net_factory.from_scratch(datamodule.head_metas)
    variables = init_fn(jax.random.PRNGKey(0), (1, 97, 97, 3))

    images, targets, _ = next(iter(datamodule.train_loader()))
    images = jnp.asarray(images)
    targets = jax.tree_util.tree_map(jnp.asarray, targets)

    loss_fn = losses.Factory().factory(datamodule.head_metas)
    args = types.SimpleNamespace(
        momentum=0.9, beta2=0.999, adam_eps=1e-6, nesterov=True,
        weight_decay=0.0, adam=False, amsgrad=False,
        lr=3e-4, lr_decay=[], lr_decay_factor=0.1, lr_decay_epochs=1.0,
        lr_warm_up_start_epoch=0, lr_warm_up_epochs=1,
        lr_warm_up_factor=1.0, lr_warm_restarts=[],
        lr_warm_restart_duration=0.5)
    optimizer, schedule = optimize.factory_optimizer(
        args, training_batches_per_epoch=1)

    train_step = build_train_step(model, loss_fn, optimizer, schedule,
                                  clip_grad_norm=1.0, mesh=make_mesh(1))
    params = variables['params']
    loss_params = loss_fn.init_params()
    state = TrainState(
        params=params,
        batch_stats=variables.get('batch_stats', {}),
        opt_state=optimizer.init({'model': params, 'loss': loss_params}),
        ema_params=jax.tree_util.tree_map(jnp.copy, params),
        step=jnp.zeros((), dtype=jnp.int32),
        loss_params=loss_params,
        loss_state=loss_fn.init_state(),
    )

    first_loss = None
    loss = None
    n_steps = 60
    for _ in range(n_steps):
        state, loss, _ = train_step(state, images, targets)
        if first_loss is None:
            first_loss = float(loss)
    final_loss = float(loss)

    assert np.isfinite(first_loss) and np.isfinite(final_loss)
    # a healthy pipeline drops the fixture loss by far more than 40%
    # in 60 steps; a broken loss/optimizer/encoder wiring does not
    assert final_loss < 0.6 * first_loss, (first_loss, final_loss)

    # CIF confidence must localize the GT keypoints: for the target's
    # annotated cells, the predicted per-field argmax lands within 2
    # cells of the GT argmax for most annotated fields
    cif_target = np.asarray(targets[0])  # (B, 17, 5, H, W)
    fields = model.apply(
        {'params': state.params, 'batch_stats': state.batch_stats},
        images, train=False)
    cif_pred = np.asarray(fields[0])  # (B, 17, 5, fh, fw) decoded layout
    conf_pred = cif_pred[0, :, 1]  # sigmoid confidences
    conf_tgt = np.nan_to_num(cif_target[0, :, 0], nan=0.0)

    annotated = [f for f in range(conf_tgt.shape[0])
                 if conf_tgt[f].max() > 0.5]
    assert annotated, 'fixture target has no annotated keypoints'
    hits = 0
    for f in annotated:
        ty, tx = np.unravel_index(np.argmax(conf_tgt[f]),
                                  conf_tgt[f].shape)
        py, px = np.unravel_index(np.argmax(conf_pred[f]),
                                  conf_pred[f].shape)
        if abs(int(py) - int(ty)) <= 2 and abs(int(px) - int(tx)) <= 2:
            hits += 1
    assert hits >= 0.6 * len(annotated), (
        f'only {hits}/{len(annotated)} CIF fields localized their '
        f'ground-truth keypoint after {n_steps} overfit steps')
