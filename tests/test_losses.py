"""Loss component tests (reference ``tests/test_scale_loss.py`` et al.)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import openpifpaf_tpu
from openpifpaf_tpu.training import losses


def test_soft_clamp():
    x = jnp.array([0.0, 1.0, 5.0, 10.0])
    y = losses.soft_clamp(x, 5.0)
    np.testing.assert_allclose(y[:3], [0.0, 1.0, 5.0], atol=1e-6)
    assert float(y[3]) == pytest.approx(5.0 + np.log(1.0 + 5.0), abs=1e-5)


def test_bce_perfect_prediction_small_loss():
    # x layout: [logb, conf_logit]; t layout: [conf]
    x = jnp.zeros((1, 1, 1, 4, 2))
    t = jnp.zeros((1, 1, 1, 4, 1))
    # background target with very negative logit -> clamped to zero loss
    x = x.at[..., 1].set(-20.0)
    l = losses.bce_loss(x, t, xi=[1], ti=[0])
    assert float(l) == pytest.approx(0.0, abs=1e-6)


def test_bce_nan_targets_ignored():
    x = jnp.zeros((1, 1, 1, 4, 2))
    t = jnp.full((1, 1, 1, 4, 1), jnp.nan)
    l = losses.bce_loss(x, t, xi=[1], ti=[0])
    assert float(l) == 0.0


def test_scale_loss_perfect():
    # x: [logb, conf, scale_raw]; t: [scale]
    target_scale = 3.0
    raw = float(np.log(np.exp(target_scale) - 1.0))  # softplus inverse
    x = jnp.full((1, 1, 1, 2, 3), raw)
    t = jnp.full((1, 1, 1, 2, 1), target_scale)
    l = losses.scale_loss(x, t, xi=[2], ti=[0])
    assert float(l) == pytest.approx(0.0, abs=1e-6)


def test_scale_loss_nan_ignored():
    x = jnp.zeros((1, 1, 1, 2, 3))
    t = jnp.full((1, 1, 1, 2, 1), jnp.nan)
    assert float(losses.scale_loss(x, t, xi=[2], ti=[0])) == 0.0


def test_regression_loss_finite_with_nan_targets():
    nv = 1
    # x: [logb, conf, dx, dy, scale_raw]
    x = jnp.zeros((1, 1, 2, 2, 5))
    # t: [conf, dx, dy, bmin, scale] with one valid and one NaN cell
    t = np.full((1, 1, 2, 2, 5), np.nan, dtype=np.float32)
    t[0, 0, 0, 0] = [1.0, 0.5, -0.5, 0.1, 2.0]
    l = losses.regression_loss(
        jnp.asarray(x), jnp.asarray(t),
        xi=[2, 3, 4], ti=[1, 2, 3, 4])
    assert np.isfinite(float(l))
    assert float(l) != 0.0


def test_composite_loss_structure():
    datamodule = openpifpaf_tpu.datasets.factory('cocokp')
    loss_fn = losses.Factory().factory(datamodule.head_metas)
    assert loss_fn.field_names == [
        'cocokp.cif.c', 'cocokp.cif.vec', 'cocokp.cif.scales',
        'cocokp.caf.c', 'cocokp.caf.vec', 'cocokp.caf.scales',
    ]

    rng = np.random.RandomState(0)
    cif_x = jnp.asarray(rng.randn(2, 17, 5, 7, 9).astype(np.float32))
    caf_x = jnp.asarray(rng.randn(2, 19, 8, 7, 9).astype(np.float32))
    cif_t = np.full((2, 17, 5, 7, 9), np.nan, dtype=np.float32)
    caf_t = np.full((2, 19, 9, 7, 9), np.nan, dtype=np.float32)
    cif_t[..., 0, :, :] = 0.0
    cif_t[0, 3, :, 2, 2] = [1.0, 0.3, -0.2, 0.0125, 1.5]
    caf_t[..., 0, :, :] = 0.0
    caf_t[0, 5, :, 3, 3] = [1.0, 0.1, 0.2, -0.5, 0.8, 0.0125, 0.0125, 1.0, 1.2]

    total, head_losses, _ = loss_fn((cif_x, caf_x),
                                    (jnp.asarray(cif_t), jnp.asarray(caf_t)))
    assert np.isfinite(float(total))
    assert len(head_losses) == 6
    assert all(np.isfinite(float(l)) for l in head_losses if l is not None)


def test_composite_loss_gradients_finite():
    import jax

    datamodule = openpifpaf_tpu.datasets.factory('cocokp')
    loss_fn = losses.Factory().factory(datamodule.head_metas)

    rng = np.random.RandomState(1)
    cif_x = jnp.asarray(rng.randn(1, 17, 5, 5, 5).astype(np.float32))
    caf_x = jnp.asarray(rng.randn(1, 19, 8, 5, 5).astype(np.float32))
    cif_t = np.full((1, 17, 5, 5, 5), np.nan, dtype=np.float32)
    caf_t = np.full((1, 19, 9, 5, 5), np.nan, dtype=np.float32)
    cif_t[..., 0, :, :] = 0.0
    cif_t[0, 0, :, 1, 1] = [1.0, 0.1, 0.1, 0.0125, 1.0]
    caf_t[..., 0, :, :] = 0.0

    def total_loss(cif_x, caf_x):
        total, _, _ = loss_fn((cif_x, caf_x),
                              (jnp.asarray(cif_t), jnp.asarray(caf_t)))
        return total

    g_cif, g_caf = jax.grad(total_loss, argnums=(0, 1))(cif_x, caf_x)
    assert bool(jnp.all(jnp.isfinite(g_cif)))
    assert bool(jnp.all(jnp.isfinite(g_caf)))


def test_component_config_flags():
    """Loss component CLI flags (reference components.py cli/configure)."""
    import argparse
    from openpifpaf_tpu.training import losses

    saved = dataclasses.replace(losses.COMPONENT_CONFIG)
    saved_tsw = losses.Factory.task_sparsity_weight
    try:
        parser = argparse.ArgumentParser()
        losses.Factory.cli(parser)
        args = parser.parse_args([
            '--focal-gamma', '2.0', '--focal-alpha', '0.25',
            '--bce-background-clamp', '-10',
            '--b-scale', '3.0', '--scale-log',
            '--regression-soft-clamp', '2.0',
            '--task-sparsity-weight', '0.1'])
        losses.Factory.configure(args)
        cc = losses.COMPONENT_CONFIG
        assert cc.focal_gamma == 2.0 and cc.focal_alpha == 0.25
        assert cc.bce_background_clamp == -10.0
        assert cc.b_scale == 3.0 and cc.scale_log
        assert cc.regression_soft_clamp == 2.0
        assert losses.Factory.task_sparsity_weight == 0.1

        import openpifpaf_tpu
        datamodule = openpifpaf_tpu.datasets.factory('cocokp')
        loss_fn = losses.Factory().factory(datamodule.head_metas)
        assert loss_fn.task_sparsity_weight == 0.1

        # loss values still finite with the modified constants
        rng = np.random.RandomState(0)
        x = [jnp.asarray(rng.randn(1, 17, 5, 5, 7).astype(np.float32)),
             jnp.asarray(rng.randn(1, 19, 9, 5, 7).astype(np.float32))]
        t = [jnp.zeros((1, 17, 5, 5, 7), jnp.float32),
             jnp.zeros((1, 19, 9, 5, 7), jnp.float32)]
        total, head_losses, _ = loss_fn(x, t, loss_fn.init_params(),
                                        loss_fn.init_state())
        assert np.isfinite(float(total))
    finally:
        for f in dataclasses.fields(saved):
            setattr(losses.COMPONENT_CONFIG, f.name, getattr(saved, f.name))
        losses.Factory.task_sparsity_weight = saved_tsw


def test_scale_log_space():
    """--scale-log uses log-space absolute difference."""
    from openpifpaf_tpu.training.losses import scale_loss

    x = jnp.full((1, 1, 1, 1, 3), 2.0)
    t = jnp.full((1, 1, 1, 1, 3), 5.0)
    l_lin = float(scale_loss(x, t, xi=[0], ti=[0]))
    l_log = float(scale_loss(x, t, xi=[0], ti=[0], log_space=True))
    assert l_lin != l_log
    import math
    sp = math.log1p(math.exp(2.0))
    d = abs(math.log(sp) - math.log(5.0))
    expected = 0.5 * d * d if d < 1 else d - 0.5
    np.testing.assert_allclose(l_log, expected, rtol=1e-5)


def test_task_sparsity_penalty():
    """Sparsity penalty targets head conv kernels only."""
    from openpifpaf_tpu.training.trainer import _head_sparsity_penalty

    params = {
        'base_net': {'Conv_0': {'kernel': jnp.ones((3, 3, 4, 8))}},
        'head_nets_0': {'Conv_0': {'kernel': jnp.full((1, 1, 4, 10), 2.0),
                                   'bias': jnp.zeros((10,))}},
    }
    p = float(_head_sparsity_penalty(params))
    # max over cin of |2.0| = 2.0, summed over (1, 1, 10) = 20
    np.testing.assert_allclose(p, 20.0, rtol=1e-6)


def test_soft_clamp_gradient_finite_at_pole():
    """d/dx of the untaken log1p branch has a pole at x = max_value - 1;
    jnp.where does not protect the backward pass, so the unclamped
    formulation produced grad = NaN on an exact float hit (observed as
    rare full-training NaNs). The argument pre-clamp must keep the
    gradient finite everywhere."""
    from openpifpaf_tpu.training.losses import soft_clamp

    for x in (4.0, 5.0, 6.0, 3.0, 0.0, -2.0, -100.0):
        g = jax.grad(lambda v: soft_clamp(v, 5.0))(jnp.float32(x))
        assert np.isfinite(float(g)), f'grad NaN at x={x}'
        val = float(soft_clamp(jnp.float32(x), 5.0))
        assert np.isfinite(val)
    # clamped region still log-damped
    assert float(soft_clamp(jnp.float32(10.0), 5.0)) == pytest.approx(
        5.0 + np.log1p(5.0))
