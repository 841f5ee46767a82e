"""Fused branch2 Pallas kernel: interpret-mode parity on CPU.

Covers ``models/block_pallas.py`` — the full-block-VMEM-residency
formulation of ShuffleNetV2K repeat blocks (branch2 in one Mosaic
kernel, channel shuffle left to XLA) — against the BN-folded XLA path.
The kernel is numerically exact; docs/perf.md records why it still
loses the e2e k16 shootout and therefore is not the default engine.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openpifpaf_tpu.models.basenetworks import ShuffleNetV2K
from openpifpaf_tpu.models import block_pallas as bp
from openpifpaf_tpu.models.fused_inference import (FoldedBlock, FoldedConv,
                                                   fold_shufflenet)


@pytest.fixture(autouse=True)
def _f32_matmuls():
    # this CPU build's default matmul precision is bf16-class; the kernel
    # asks for f32 accumulation, so the XLA reference must too. Scoped so
    # the setting cannot leak into other test modules.
    with jax.default_matmul_precision('float32'):
        yield


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


@pytest.mark.parametrize('h,w,cb,k,dilation,r_tile,leaky', [
    (21, 17, 12, 5, 1, 8, False),   # ragged last tile
    (16, 16, 4, 5, 1, 16, False),   # single tile
    (11, 9, 6, 3, 1, 4, False),     # k=3
    (15, 13, 6, 5, 2, 8, False),    # dilation 2 (k16w-style stage 4)
    (12, 10, 8, 5, 1, 8, True),     # leaky relu
])
def test_branch2_segment_parity(h, w, cb, k, dilation, r_tile, leaky):
    rng = np.random.RandomState(0)
    block = _mk_block(rng, cb, k=k, dilation=dilation, leaky=leaky)
    x = np.maximum(rng.randn(1, h, w, 2 * cb).astype(np.float32), 0)
    ref = np.asarray(block(jnp.asarray(x)))[0]

    c2p = bp._round_up(2 * cb, 128)
    cm = bp._round_up(cb, 128)
    weights = bp.branch2_weights_from_folded(block, c2p, cm)
    out = np.asarray(bp.run_segment(
        jnp.asarray(x[0]), [weights], k=k, d=dilation, r_tile=r_tile,
        interpret=True))
    np.testing.assert_allclose(out, ref, atol=1e-5, rtol=1e-5)


def test_branch2_two_block_chain():
    """Chained repeat blocks re-pad between kernels; parity must be
    closed under composition."""
    rng = np.random.RandomState(1)
    cb, k = 8, 5
    blocks = [_mk_block(rng, cb, k=k) for _ in range(2)]
    x = np.maximum(rng.randn(1, 19, 14, 2 * cb).astype(np.float32), 0)
    ref = jnp.asarray(x)
    for blk in blocks:
        ref = blk(ref)
    ref = np.asarray(ref)[0]

    c2p = bp._round_up(2 * cb, 128)
    cm = bp._round_up(cb, 128)
    ws = [bp.branch2_weights_from_folded(b, c2p, cm) for b in blocks]
    out = np.asarray(bp.run_segment(
        jnp.asarray(x[0]), ws, k=k, d=1, r_tile=8, interpret=True))
    np.testing.assert_allclose(out, ref, atol=1e-5, rtol=1e-5)


def test_build_mosaic_forward_matches_flax():
    net = ShuffleNetV2K(stages_repeats=[2, 3, 2],
                        stages_out_channels=[8, 12, 16, 20, 24])
    variables = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 33, 49, 3)),
                         train=False)
    folded = fold_shufflenet(net, variables['params'],
                             variables['batch_stats'])
    forward = bp.build_mosaic_forward(net, folded, dtype=jnp.float32,
                                      r_tile=8, interpret=True)

    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(1, 33, 49, 3).astype(np.float32))
    ref = np.asarray(net.apply(variables, x, train=False))
    out = np.asarray(jax.jit(forward)(x))
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=2e-5)
