"""Forward shape tests (reference ``tests/test_forward.py:8-58``)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import openpifpaf_tpu
from openpifpaf_tpu.models import factory as models_factory


def build_model(base_name='resnet18', upsample=1):
    datamodule = openpifpaf_tpu.datasets.factory('cocokp')
    datamodule.head_metas[0].upsample_stride = upsample
    datamodule.head_metas[1].upsample_stride = upsample
    net_factory = models_factory.Factory(base_name=base_name,
                                         upsample_stride=upsample)
    model, init_fn = net_factory.from_scratch(datamodule.head_metas)
    variables = init_fn(jax.random.PRNGKey(0), (1, 241, 321, 3))
    return model, variables


def test_forward_shapes():
    model, variables = build_model('resnet18')
    dummy = jnp.zeros((1, 241, 321, 3))
    cif, caf = model.apply(variables, dummy, train=False)

    # stride 16: 241 -> 16, 321 -> 21 (ceil division of conv stride chain)
    assert cif.shape == (1, 17, 5, 16, 21)
    assert caf.shape == (1, 19, 8, 16, 21)


def test_forward_upsample():
    model, variables = build_model('resnet18', upsample=2)
    dummy = jnp.zeros((1, 241, 321, 3))
    cif, caf = model.apply(variables, dummy, train=False)

    assert cif.shape == (1, 17, 5, 31, 41)
    assert caf.shape == (1, 19, 8, 31, 41)


def test_forward_train_mode_raw():
    model, variables = build_model('resnet18')
    rng = np.random.RandomState(0)
    dummy = jnp.asarray(rng.randn(1, 97, 129, 3).astype(np.float32) * 3.0)
    (cif, caf), _ = model.apply(variables, dummy, train=True,
                                mutable=['batch_stats'])
    assert cif.shape == (1, 17, 5, 7, 9)
    assert caf.shape == (1, 19, 8, 7, 9)
    # raw training output: confidences are logits (not sigmoided)
    assert not bool(jnp.all((cif[:, :, 1] >= 0) & (cif[:, :, 1] <= 1)))


def test_shufflenet_shapes():
    model, variables = build_model('shufflenetv2k16')
    dummy = jnp.zeros((1, 97, 129, 3))
    cif, caf = model.apply(variables, dummy, train=False)
    assert cif.shape == (1, 17, 5, 7, 9)
    assert caf.shape == (1, 19, 8, 7, 9)


def test_inference_postprocessing_ranges():
    model, variables = build_model('resnet18')
    rng = np.random.RandomState(0)
    dummy = jnp.asarray(rng.randn(1, 97, 129, 3).astype(np.float32))
    cif, caf = model.apply(variables, dummy, train=False)

    # confidences in [0, 1]
    assert bool(jnp.all((cif[:, :, 1] >= 0) & (cif[:, :, 1] <= 1)))
    # scales positive (softplus)
    assert bool(jnp.all(cif[:, :, 4] > 0))
    assert bool(jnp.all(caf[:, :, 6:8] > 0))

    # index field added: mean regression x should be near the coordinate mean
    h, w = cif.shape[-2:]
    assert abs(float(jnp.mean(cif[:, :, 2])) - (w - 1) / 2) < 3.0
    assert abs(float(jnp.mean(cif[:, :, 3])) - (h - 1) / 2) < 3.0


@pytest.mark.parametrize('base_name,out_features', [
    ('resnext50', 2048),
    ('shufflenetv2x1', 1024),
    ('shufflenetv2x2', 2048),
    ('shufflenetv2kx5', 2560),
])
def test_backbone_registry_variants(base_name, out_features):
    """Every reference BASE_FACTORIES entry exists and produces stride-16
    features of the documented width (reference network/factory.py:51-79)."""
    net = models_factory.BASE_FACTORIES[base_name]()
    assert net.stride == 16
    assert net.out_features == out_features
    x = np.zeros((1, 65, 65, 3), np.float32)
    variables = net.init(jax.random.PRNGKey(0), x, train=False)
    out = net.apply(variables, x, train=False)
    assert out.shape == (1, 5, 5, out_features)


def test_backbone_options_configure():
    """Family-level backbone options (reference --shufflenetv2k-*/--resnet-*
    stride surgery, basenetworks.py:357-405/152-183) rebuild the nets."""
    from openpifpaf_tpu.models import factory

    factory.SHUFFLENETV2K_OPTIONS.update(norm='group', conv5_as_stage=True)
    factory.RESNET_OPTIONS.update(block5_dilation=2)
    try:
        net = factory.BASE_FACTORIES['shufflenetv2k16']()
        variables = net.init(jax.random.PRNGKey(0),
                             np.zeros((1, 33, 33, 3), np.float32), train=False)
        assert 'batch_stats' not in variables  # group norm has no stats
        out = net.apply(variables, np.zeros((1, 33, 33, 3), np.float32),
                        train=False)
        assert out.shape == (1, 3, 3, 1392)

        res = factory.BASE_FACTORIES['resnet50']()
        assert res.stride == 8  # pool removed (16) + dilated block5 (/2)
    finally:
        factory.SHUFFLENETV2K_OPTIONS.update(norm='batch',
                                             conv5_as_stage=False)
        factory.RESNET_OPTIONS.update(block5_dilation=1)
