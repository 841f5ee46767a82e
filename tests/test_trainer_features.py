"""--stride-apply gradient accumulation and --fix-batch-norm semantics.

Reference: trainer.py:293 (apply/reset gradients every n batches, gradient
*sums* accumulate between applies) and trainer.py:273-279 (batch-norm
modules switched to eval mode: running stats used, not updated).
"""

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from openpifpaf_tpu.training.trainer import TrainState, build_train_step


class TinyModel(nn.Module):
    """Minimal model with the Shell call signature (train/head_mask/bn_train)."""

    use_bn: bool = False

    @nn.compact
    def __call__(self, x, *, train=False, head_mask=None, bn_train=None):
        y = nn.Dense(4)(x)
        if self.use_bn:
            y = nn.BatchNorm(
                use_running_average=not (train if bn_train is None
                                         else bn_train),
                momentum=0.9)(y)
        return (y,)


class SquareLoss:
    def init_params(self):
        return {}

    def init_state(self):
        return {}

    def __call__(self, outputs, targets, loss_params, loss_state):
        total = jnp.sum((outputs[0] - targets[0]) ** 2)
        return total, (total,), loss_state


def make_state(model, images, *, optimizer, loss_fn, stride_apply=1):
    variables = model.init(jax.random.PRNGKey(0), images)
    params = variables['params']
    loss_params = loss_fn.init_params()
    grad_accum = {}
    if stride_apply > 1:
        grad_accum = jax.tree_util.tree_map(
            jnp.zeros_like, {'model': params, 'loss': loss_params})
    return variables, TrainState(
        params=params,
        batch_stats=variables.get('batch_stats', {}),
        opt_state=optimizer.init({'model': params, 'loss': loss_params}),
        ema_params=jax.tree_util.tree_map(jnp.copy, params),
        step=jnp.zeros((), dtype=jnp.int32),
        loss_params=loss_params,
        loss_state=loss_fn.init_state(),
        grad_accum=grad_accum,
    )


def test_stride_apply_accumulates_summed_grads():
    model = TinyModel(use_bn=True)
    loss_fn = SquareLoss()
    lr = 0.1
    optimizer = optax.sgd(lr)
    schedule = lambda step: lr  # noqa: E731

    rng = np.random.RandomState(0)
    b1 = jnp.asarray(rng.randn(4, 3).astype(np.float32))
    b2 = jnp.asarray(rng.randn(4, 3).astype(np.float32))
    t1 = (jnp.asarray(rng.randn(4, 4).astype(np.float32)),)
    t2 = (jnp.asarray(rng.randn(4, 4).astype(np.float32)),)

    variables, state0 = make_state(
        model, b1, optimizer=optimizer, loss_fn=loss_fn, stride_apply=2)
    params0 = jax.tree_util.tree_map(jnp.copy, state0.params)

    step = build_train_step(model, loss_fn, optimizer, schedule,
                            stride_apply=2)

    # expected: grads of both micro-batches at params0, summed
    def loss_at(params, batch_stats, images, targets):
        outputs, _ = model.apply(
            {'params': params, 'batch_stats': batch_stats},
            images, train=True, mutable=['batch_stats'])
        total, _, _ = loss_fn(outputs, targets, {}, {})
        return total

    g1 = jax.grad(loss_at)(params0, state0.batch_stats, b1, t1)
    # second micro-batch sees the batch_stats advanced by micro-step 1,
    # but grads don't depend on batch_stats' running buffers in train mode
    g2 = jax.grad(loss_at)(params0, state0.batch_stats, b2, t2)
    expected = jax.tree_util.tree_map(
        lambda p, a, b: p - lr * (a + b), params0, g1, g2)

    state1, _, _ = step(state0, b1, t1)
    # no apply yet: params, opt_state, ema unchanged
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        state1.params, params0)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        state1.ema_params, params0)

    state2, _, _ = step(state1, b2, t2)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-6),
        state2.params, expected)
    # accumulator reset after apply
    total_accum = jax.tree_util.tree_reduce(
        lambda acc, g: acc + float(jnp.sum(jnp.abs(g))),
        state2.grad_accum, 0.0)
    assert total_accum == 0.0


def test_fix_batch_norm_freezes_running_stats():
    model = TinyModel(use_bn=True)
    loss_fn = SquareLoss()
    optimizer = optax.sgd(0.01)
    schedule = lambda step: 0.01  # noqa: E731

    rng = np.random.RandomState(1)
    images = jnp.asarray(rng.randn(4, 3).astype(np.float32))
    targets = (jnp.asarray(rng.randn(4, 4).astype(np.float32)),)

    variables, state0 = make_state(
        model, images, optimizer=optimizer, loss_fn=loss_fn)
    stats0 = jax.tree_util.tree_map(
        lambda a: np.asarray(a).copy(), state0.batch_stats)

    step_fixed = build_train_step(model, loss_fn, optimizer, schedule,
                                  fix_bn=True)
    state1, _, _ = step_fixed(state0, images, targets)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), b),
        state1.batch_stats, stats0)

    # without fix_bn the running stats move
    _, state0b = make_state(
        model, images, optimizer=optimizer, loss_fn=loss_fn)
    stats0b = jax.tree_util.tree_map(
        lambda a: np.asarray(a).copy(), state0b.batch_stats)
    step_free = build_train_step(model, loss_fn, optimizer, schedule)
    state2, _, _ = step_free(state0b, images, targets)
    moved = jax.tree_util.tree_reduce(
        lambda acc, pair: acc or pair,
        jax.tree_util.tree_map(
            lambda a, b: bool(np.any(np.asarray(a) != b)),
            state2.batch_stats, stats0b),
        False)
    assert moved


def test_bf16_train_step():
    """Mixed-precision train step: bf16 backbone compute, f32 master
    weights; params/batch_stats stay f32 and the loss tracks the f32 step."""
    import openpifpaf_tpu
    from openpifpaf_tpu.models import factory as models_factory
    from openpifpaf_tpu.training import losses

    datamodule = openpifpaf_tpu.datasets.factory('cocokp')
    net_factory = models_factory.Factory(base_name='resnet18')
    model, init_fn = net_factory.from_scratch(datamodule.head_metas)
    variables = init_fn(jax.random.PRNGKey(0), (1, 97, 129, 3))
    loss_fn = losses.Factory().factory(datamodule.head_metas)
    optimizer = optax.sgd(1e-3)
    schedule = lambda step: 1e-3  # noqa: E731

    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.randn(1, 97, 129, 3).astype(np.float32))
    fh, fw = 7, 9
    targets = (jnp.zeros((1, 17, 5, fh, fw), jnp.float32),
               jnp.zeros((1, 19, 9, fh, fw), jnp.float32))

    def fresh_state():
        params = variables['params']
        loss_params = loss_fn.init_params()
        return TrainState(
            params=jax.tree_util.tree_map(jnp.copy, params),
            batch_stats=jax.tree_util.tree_map(
                jnp.copy, variables.get('batch_stats', {})),
            opt_state=optimizer.init(
                {'model': params, 'loss': loss_params}),
            ema_params=jax.tree_util.tree_map(jnp.copy, params),
            step=jnp.zeros((), dtype=jnp.int32),
            loss_params=loss_params,
            loss_state=loss_fn.init_state(),
        )

    step_bf16 = build_train_step(model, loss_fn, optimizer, schedule,
                                 bf16=True)
    step_f32 = build_train_step(model, loss_fn, optimizer, schedule)

    state_b, loss_b, _ = step_bf16(fresh_state(), images, targets)
    state_f, loss_f, _ = step_f32(fresh_state(), images, targets)

    assert np.isfinite(float(loss_b))
    np.testing.assert_allclose(float(loss_b), float(loss_f), rtol=0.05)

    # master weights and BN buffers stay f32
    for leaf in jax.tree_util.tree_leaves(state_b.params):
        assert leaf.dtype == jnp.float32
    for leaf in jax.tree_util.tree_leaves(state_b.batch_stats):
        assert leaf.dtype == jnp.float32

    # the update direction agrees with the f32 step
    diffs_b = jax.tree_util.tree_map(
        lambda a, b: np.asarray(a - b),
        state_b.params, dict(variables['params']))
    diffs_f = jax.tree_util.tree_map(
        lambda a, b: np.asarray(a - b),
        state_f.params, dict(variables['params']))
    num = jax.tree_util.tree_reduce(
        lambda acc, x: acc + x,
        jax.tree_util.tree_map(
            lambda a, b: float(np.sum(a * b)), diffs_b, diffs_f), 0.0)
    den_b = jax.tree_util.tree_reduce(
        lambda acc, x: acc + float(np.sum(x * x)), diffs_b, 0.0)
    den_f = jax.tree_util.tree_reduce(
        lambda acc, x: acc + float(np.sum(x * x)), diffs_f, 0.0)
    cos = num / max(1e-12, (den_b * den_f) ** 0.5)
    assert cos > 0.9


def test_remat_train_step_matches_plain():
    """--remat recomputes the forward during backward; the step result
    must be identical to the plain step (same math, less memory)."""
    model = TinyModel(use_bn=True)
    loss_fn = SquareLoss()
    optimizer = optax.sgd(0.1)
    schedule = lambda step: 0.1  # noqa: E731

    rng = np.random.RandomState(7)
    images = jnp.asarray(rng.randn(4, 3).astype(np.float32))
    targets = (jnp.asarray(rng.randn(4, 4).astype(np.float32)),)

    _, state_a = make_state(model, images, optimizer=optimizer,
                            loss_fn=loss_fn)
    _, state_b = make_state(model, images, optimizer=optimizer,
                            loss_fn=loss_fn)

    step_plain = build_train_step(model, loss_fn, optimizer, schedule)
    step_remat = build_train_step(model, loss_fn, optimizer, schedule,
                                  remat=True)

    state_a, loss_a, _ = step_plain(state_a, images, targets)
    state_b, loss_b, _ = step_remat(state_b, images, targets)

    np.testing.assert_allclose(float(loss_a), float(loss_b), rtol=1e-6)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7),
        state_a.params, state_b.params)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7),
        state_a.batch_stats, state_b.batch_stats)


def test_trainer_cli_flags():
    import argparse
    from openpifpaf_tpu.training.trainer import Trainer

    parser = argparse.ArgumentParser()
    Trainer.cli(parser)
    args = parser.parse_args(['--stride-apply', '3', '--fix-batch-norm', '2'])
    assert args.stride_apply == 3
    assert args.fix_batch_norm == 2
    args2 = parser.parse_args(['--fix-batch-norm'])
    assert args2.fix_batch_norm is True
    args3 = parser.parse_args([])
    assert args3.fix_batch_norm is False
    assert args3.remat is False
    args4 = parser.parse_args(['--remat'])
    assert args4.remat is True


def test_cf4_dropout_train_step():
    """--cf4-dropout: dropout active in train mode, none at inference."""
    import openpifpaf_tpu
    from openpifpaf_tpu.models import factory as models_factory
    from openpifpaf_tpu.training import losses

    saved = models_factory.CF4_OPTIONS['dropout_p']
    models_factory.CF4_OPTIONS['dropout_p'] = 0.5
    try:
        datamodule = openpifpaf_tpu.datasets.factory('cocokp')
        net_factory = models_factory.Factory(base_name='resnet18')
        model, init_fn = net_factory.from_scratch(datamodule.head_metas)
        assert model.head_nets[0].dropout_p == 0.5
        variables = init_fn(jax.random.PRNGKey(0), (1, 97, 129, 3))

        loss_fn = losses.Factory().factory(datamodule.head_metas)
        optimizer = optax.sgd(1e-3)
        step = build_train_step(model, loss_fn, optimizer, lambda s: 1e-3)

        rng = np.random.RandomState(0)
        images = jnp.asarray(rng.randn(1, 97, 129, 3).astype(np.float32))
        targets = (jnp.zeros((1, 17, 5, 7, 9), jnp.float32),
                   jnp.zeros((1, 19, 9, 7, 9), jnp.float32))
        state = TrainState(
            params=variables['params'],
            batch_stats=variables.get('batch_stats', {}),
            opt_state=optimizer.init({'model': variables['params'],
                                      'loss': {}}),
            ema_params=jax.tree_util.tree_map(jnp.copy, variables['params']),
            step=jnp.zeros((), dtype=jnp.int32),
        )
        state, loss, _ = step(state, images, targets)
        assert np.isfinite(float(loss))

        # inference path unaffected (deterministic, no rng needed)
        out = model.apply({'params': state.params,
                           'batch_stats': state.batch_stats},
                          images, train=False)
        assert np.all(np.isfinite(np.asarray(out[0])))
    finally:
        models_factory.CF4_OPTIONS['dropout_p'] = saved
