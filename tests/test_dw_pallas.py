"""Parity of the NHWC depthwise Pallas kernel vs lax.conv.

CPU CI runs the kernel in interpret mode; the real-device Mosaic
lowering is additionally checked by the bench's pallas-parity stage
and by predict --backbone-engine dwpallas runs.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openpifpaf_tpu.models import dw_pallas
from openpifpaf_tpu.models.fused_inference import FoldedConv


def _reference(x, kernel, bias, dilation, act, leaky):
    pad = (kernel.shape[0] - 1) // 2 * dilation
    y = jax.lax.conv_general_dilated(
        x, kernel, window_strides=(1, 1),
        padding=[(pad, pad), (pad, pad)],
        rhs_dilation=(dilation, dilation),
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
        feature_group_count=x.shape[-1])
    y = y + bias
    if act:
        return jax.nn.leaky_relu(y) if leaky else jax.nn.relu(y)
    return y


@pytest.mark.parametrize('h,w,c,k,d', [
    (17, 23, 87, 5, 1),    # k16 stage-2 half channels (odd sizes)
    (33, 40, 174, 5, 1),   # stage-3
    (9, 11, 348, 5, 2),    # stage-4 with dilation (--shufflenetv2k-*)
    (16, 16, 64, 3, 1),    # 3x3 variant
])
def test_depthwise_matches_lax_conv(h, w, c, k, d):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, h, w, c).astype(np.float32))
    kernel = jnp.asarray(0.1 * rng.randn(k, k, 1, c).astype(np.float32))
    bias = jnp.asarray(0.01 * rng.randn(c).astype(np.float32))

    want = _reference(x, kernel, bias, d, act=True, leaky=False)
    got = dw_pallas.depthwise_conv(x, kernel, bias, dilation=d,
                                   act=True, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_no_activation_and_leaky():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(1, 12, 15, 32).astype(np.float32))
    kernel = jnp.asarray(0.1 * rng.randn(5, 5, 1, 32).astype(np.float32))
    bias = jnp.asarray(0.01 * rng.randn(32).astype(np.float32))
    for act, leaky in ((False, False), (True, True)):
        want = _reference(x, kernel, bias, 1, act=act, leaky=leaky)
        got = dw_pallas.depthwise_conv(x, kernel, bias, act=act,
                                       leaky=leaky, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-5, rtol=1e-5)


def test_folded_conv_dwpallas_mode_routes_and_falls_back(monkeypatch):
    import openpifpaf_tpu.models.dw_pallas as dwp
    monkeypatch.setattr(
        dwp, '_make_dw_call',
        functools_partial_interpret(dwp._make_dw_call))

    rng = np.random.RandomState(2)
    c = 24
    x = jnp.asarray(rng.randn(1, 10, 13, c).astype(np.float32))

    # depthwise stride-1: pallas path
    fc = FoldedConv(kernel=0.1 * rng.randn(5, 5, 1, c).astype(np.float32),
                    bias=0.01 * rng.randn(c).astype(np.float32),
                    groups=c, mode='dwpallas')
    ref = FoldedConv(kernel=fc.kernel, bias=fc.bias, groups=c)
    np.testing.assert_allclose(np.asarray(fc(x)), np.asarray(ref(x)),
                               atol=1e-5, rtol=1e-5)

    # 1x1 dense / strided depthwise: falls back to lax conv unchanged
    for kwargs in (dict(kernel=0.1 * rng.randn(1, 1, c, c).astype(
                            np.float32),
                        bias=np.zeros(c, np.float32)),
                   dict(kernel=0.1 * rng.randn(5, 5, 1, c).astype(
                            np.float32),
                        bias=np.zeros(c, np.float32), groups=c, stride=2)):
        a = FoldedConv(mode='dwpallas', **kwargs)
        b = FoldedConv(**kwargs)
        np.testing.assert_allclose(np.asarray(a(x)), np.asarray(b(x)),
                                   atol=1e-6)


def functools_partial_interpret(make):
    import functools

    # _make_dw_call is lru_cached; wrap the undecorated signature
    @functools.wraps(make)
    def wrapped(h, w, c, k, d, r_tile, dtype_name, act, leaky, interpret):
        return make(h, w, c, k, d, r_tile, dtype_name, act, leaky, True)
    return wrapped
