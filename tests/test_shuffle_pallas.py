"""Fused ShuffleNet block kernel: interpret-mode parity on CPU.

Covers the Pallas fused non-first InvertedResidualK block
(``models/shuffle_pallas.py``) against the BN-folded XLA path for COCO-
and wholebody-like shapes, ragged tiles, dilation, leaky relu, and the
composed ``build_pallas_forward`` against the full flax backbone.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openpifpaf_tpu.models.basenetworks import ShuffleNetV2K
from openpifpaf_tpu.models import shuffle_pallas as sp
from openpifpaf_tpu.models.fused_inference import (FoldedBlock, FoldedConv,
                                                   build_pallas_forward,
                                                   fold_shufflenet)


def _mk_block(rng, cb, k=5, dilation=1, leaky=False):
    def mk_conv(kk, groups=1, act=True):
        cin = 1 if groups > 1 else cb
        kern = rng.randn(kk, kk, cin, cb).astype(np.float32) * 0.2
        bias = rng.randn(cb).astype(np.float32) * 0.1
        return FoldedConv(kernel=jnp.asarray(kern), bias=jnp.asarray(bias),
                          groups=groups, dilation=dilation, act=act,
                          non_linearity='leaky_relu' if leaky else 'relu')
    return FoldedBlock(first_in_stage=False, convs=[
        mk_conv(1), mk_conv(k, groups=cb, act=False), mk_conv(1)])


@pytest.mark.parametrize('shape,cb,k,dilation,tile_rows,leaky', [
    ((2, 21, 17, 24), 12, 5, 1, 8, False),     # ragged last tile
    ((1, 16, 16, 8), 4, 5, 1, 16, False),      # single tile
    ((1, 11, 9, 12), 6, 3, 1, 4, False),       # k=3
    ((1, 15, 13, 12), 6, 5, 2, 8, False),      # dilation 2 (k16w-style)
    ((1, 12, 10, 16), 8, 5, 1, 8, True),       # leaky relu
])
def test_fused_block_parity(shape, cb, k, dilation, tile_rows, leaky):
    rng = np.random.RandomState(0)
    block = _mk_block(rng, cb, k=k, dilation=dilation, leaky=leaky)
    x = np.maximum(rng.randn(*shape).astype(np.float32), 0)
    ref = np.asarray(block(jnp.asarray(x)))

    weights = sp.block_weights_from_folded(block)
    halo = (k - 1) // 2 * dilation
    height, width = x.shape[1], x.shape[2]
    x1p = sp.pad_half(jnp.asarray(x[..., :cb]), halo)
    x2p = sp.pad_half(jnp.asarray(x[..., cb:]), halo)
    outa, outb = sp.fused_block(x1p, x2p, weights, height=height,
                                width=width, k=k, dilation=dilation,
                                tile_rows=tile_rows, leaky=leaky,
                                interpret=True)
    out = np.concatenate(
        [np.asarray(sp.unpad_half(outa, halo, height, width, cb)),
         np.asarray(sp.unpad_half(outb, halo, height, width, cb))],
        axis=-1)
    np.testing.assert_allclose(out, ref, atol=1e-5, rtol=1e-5)

    # everything outside the interior must be zero (frame + alignment
    # padding, closed under composition)
    wa = outa.shape[1] // (height + 2 * halo)
    for outp in (outa, outb):
        frame = np.asarray(outp).reshape(x.shape[0], height + 2 * halo,
                                         wa, -1).copy()
        frame[:, halo:halo + height, halo:halo + width, :cb] = 0
        assert np.abs(frame).max() == 0.0


@pytest.mark.parametrize('impl', ['pallas', 'halves'])
def test_build_fused_forward_matches_flax(impl):
    net = ShuffleNetV2K(stages_repeats=[2, 3, 2],
                        stages_out_channels=[8, 12, 16, 20, 24])
    variables = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 33, 49, 3)),
                         train=False)
    folded = fold_shufflenet(net, variables['params'],
                             variables['batch_stats'])
    forward = build_pallas_forward(net, folded, dtype=jnp.float32,
                                   tile_rows=8, interpret=True, impl=impl)

    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(1, 33, 49, 3).astype(np.float32))
    ref = np.asarray(net.apply(variables, x, train=False))
    out = np.asarray(jax.jit(forward)(x))
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=2e-5)


def test_predictor_backbone_engine_auto_policy():
    """'auto' resolves to the halves engine only for lane-aligned channel
    halves (k30-style); k16's 174-channel halves stay on the flax graph."""
    import openpifpaf_tpu
    from openpifpaf_tpu.models import factory as models_factory
    from openpifpaf_tpu.predictor import Predictor

    datamodule = openpifpaf_tpu.datasets.factory('cocokp')
    f = models_factory.Factory(base_name='shufflenetv2k16')
    model, init_fn = f.from_scratch(datamodule.head_metas)
    variables = init_fn(jax.random.PRNGKey(0), (1, 97, 129, 3))
    p = Predictor(model=model, variables=variables)
    assert p.backbone_engine == 'auto'
    assert p._resolve_backbone_engine() is None  # 174 not a lane multiple


def test_predictor_backbone_engine_halves_parity():
    """The halves serving engine produces the same head fields as the
    flax graph (f32), through the full Predictor forward."""
    import openpifpaf_tpu
    from openpifpaf_tpu.models.shell import Shell
    from openpifpaf_tpu.models import heads as heads_mod
    from openpifpaf_tpu.predictor import Predictor

    datamodule = openpifpaf_tpu.datasets.factory('cocokp')
    # tiny ShuffleNetV2K with lane-aligned halves (256 = 2*128)
    net = ShuffleNetV2K(stages_repeats=[2, 2, 2],
                        stages_out_channels=[16, 256, 256, 256, 256])
    for i, m in enumerate(datamodule.head_metas):
        m.head_index = i
        m.base_stride = net.stride
    head_nets = [heads_mod.CompositeField4(meta=m)
                 for m in datamodule.head_metas]
    model = Shell(base_net=net, head_nets=head_nets)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 33, 49, 3)), train=False)

    rng = np.random.RandomState(2)
    images = rng.randn(1, 33, 49, 3).astype(np.float32)

    p_flax = Predictor(model=model, variables=variables)
    p_flax.backbone_engine = 'flax'
    p_flax.size_bucket = 0
    ref = p_flax.forward_fn(variables, images)

    p_eng = Predictor(model=model, variables=variables)
    p_eng.backbone_engine = 'auto'
    p_eng.size_bucket = 0
    assert p_eng._resolve_backbone_engine() is not None
    out = p_eng.forward_fn(variables, images)

    for r, o in zip(ref, out):
        np.testing.assert_allclose(np.asarray(r), np.asarray(o),
                                   atol=2e-5, rtol=2e-4)
