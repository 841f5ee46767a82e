"""BN-folded inference engine: exact parity with the flax backbone.

The folded engine re-reads the canonical flax parameter tree
(``ConvNormAct_i`` / ``InvertedResidualK_i`` auto-names) and must produce
the same features as ``ShuffleNetV2K.apply`` in eval mode — in both
compute modes ('conv' = lax convolutions, 'stencil' = matmuls +
shifted-add depthwise taps). Reference counterpart: the torch reference
serves through its training graph (``network/nets.py:7-89``); folding is
a TPU-native serving-side redesign.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openpifpaf_tpu.models.basenetworks import ShuffleNetV2K
from openpifpaf_tpu.models.fused_inference import (build_fused_backbone,
                                                   fold_shufflenet)


def _tiny_net(**kwargs):
    return ShuffleNetV2K(stages_repeats=[2, 2, 2],
                         stages_out_channels=[8, 12, 16, 20, 24], **kwargs)


def _init(net, shape=(1, 33, 49, 3), seed=0):
    # BatchNorm running stats start at (mean 0, var 1); perturb them so
    # the fold actually exercises non-trivial statistics
    variables = net.init(jax.random.PRNGKey(seed), jnp.zeros(shape),
                         train=False)
    rng = np.random.RandomState(seed + 1)

    def perturb(path, leaf):
        name = '/'.join(str(p.key) for p in path if hasattr(p, 'key'))
        a = np.asarray(leaf)
        if 'mean' in name:
            return jnp.asarray(rng.randn(*a.shape).astype(a.dtype) * 0.3)
        if 'var' in name:
            return jnp.asarray(
                (1.0 + 0.5 * rng.rand(*a.shape)).astype(a.dtype))
        return leaf

    stats = jax.tree_util.tree_map_with_path(
        perturb, variables['batch_stats'])
    return {'params': variables['params'], 'batch_stats': stats}


@pytest.mark.parametrize('mode', ['conv', 'stencil'])
@pytest.mark.parametrize('net_kwargs', [
    {},
    {'input_conv2_stride': 2, 'input_conv2_outchannels': 10},
    {'stage4_dilation': 2},
    {'conv5_as_stage': True},
    {'non_linearity': 'leaky_relu'},
])
def test_folded_matches_flax(mode, net_kwargs):
    net = _tiny_net(**net_kwargs)
    variables = _init(net)
    folded = fold_shufflenet(net, variables['params'],
                             variables['batch_stats'])
    assert folded is not None
    folded = folded.with_mode(mode)

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 33, 49, 3).astype(np.float32))
    ref = net.apply(variables, x, train=False)
    out = jax.jit(lambda f, x: f(x))(folded, x)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_group_norm_not_foldable():
    # data-dependent norms cannot be folded; rejected before reading params
    net = _tiny_net(norm='group')
    assert fold_shufflenet(net, {}, {}) is None


def test_build_fused_backbone_requires_shufflenet():
    class Wrapper:
        base_net = None
    assert build_fused_backbone(Wrapper(), {}) is None


def test_cast_dtype():
    net = _tiny_net()
    variables = _init(net)
    folded = fold_shufflenet(net, variables['params'],
                             variables['batch_stats'])
    folded16 = folded.cast(jnp.bfloat16)
    assert folded16.stem[0].kernel.dtype == jnp.bfloat16
    x = jnp.zeros((1, 17, 17, 3), jnp.bfloat16)
    out = jax.jit(lambda f, x: f(x))(folded16, x)
    assert out.dtype == jnp.bfloat16
