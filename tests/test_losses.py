"""Loss component tests (reference ``tests/test_scale_loss.py`` et al.)."""

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
