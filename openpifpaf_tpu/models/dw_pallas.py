"""Depthwise-conv-only Pallas kernel in the native NHWC lane tiling.

Target: the 44% of the k16 serving forward that XLA spends on layout
conversion around the 5x5 *depthwise* stages (docs/perf.md). XLA's
grouped-convolution lowering picks a channels-in-sublanes layout for
depthwise convs while every surrounding 1x1 conv runs channels-on-lanes,
so each depthwise stage is bracketed by two full-activation re-tiling
copies at HBM speed. This kernel computes the depthwise conv directly
in the 1x1 convs' preferred layout (C on lanes) as 25 shifted
multiply-adds on the VPU — no grouped conv in the graph, hence no
grouped layouts to convert to. The 1x1 convs stay on XLA (their MXU
scheduling is already optimal; the round-3/4 whole-branch kernels lost
by inflating those dots, docs/perf.md).

Halo handling reuses the dual-block-view trick of
:mod:`block_pallas`: the activation is zero-padded so that output tile
i only reads padded row tiles i and i+1.

Reference semantics: the depthwise convs of ``InvertedResidualK``
(``/root/reference/src/openpifpaf/network/basenetworks.py:186-242``),
bit-compatible with ``lax.conv_general_dilated(feature_group_count=C)``
up to float summation order (parity: ``tests/test_dw_pallas.py``).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(v, m):
    return -(-v // m) * m


def _dw_kernel(x0_ref, x1_ref, wd_ref, bd_ref, o_ref, *,
               k, d, r_tile, wo, act, leaky):
    """One row tile: y = act(sum_taps(win * wd) + bd).

    x0/x1 are row tiles i and i+1 of the zero-padded input
    (r_tile, wp, c); output tile (r_tile, wo, c). Output row r reads
    padded rows [i*r_tile + r, i*r_tile + r + 2*halo] — the concat
    window. Zero padding IS the conv's 'SAME' padding, so no masking
    is needed (bias/act apply only to the output tile).
    """
    halo = (k - 1) // 2 * d
    win = jnp.concatenate([x0_ref[...], x1_ref[...]], axis=0)
    win = win[:r_tile + 2 * halo]

    acc = None
    for dy in range(k):
        for dx in range(k):
            term = win[dy * d:dy * d + r_tile, dx * d:dx * d + wo, :] \
                * wd_ref[dy, dx, :]
            acc = term if acc is None else acc + term
    y = acc + bd_ref[...]
    if act:
        y = jnp.where(y > 0, y, y * 0.01) if leaky else jnp.maximum(y, 0.0)
    o_ref[...] = y.astype(o_ref.dtype)


@functools.lru_cache(maxsize=64)
def _make_dw_call(h, w, c, k, d, r_tile, dtype_name, act, leaky,
                  interpret):
    dtype = jnp.dtype(dtype_name)
    halo = (k - 1) // 2 * d
    assert r_tile >= 2 * halo, (r_tile, halo)
    n_tiles = -(-h // r_tile)
    wo = _round_up(w, 8)
    wp = wo + _round_up(2 * halo, 8)
    hp = (n_tiles + 1) * r_tile

    grid = (n_tiles,)
    x_spec0 = pl.BlockSpec((r_tile, wp, c), lambda i: (i, 0, 0))
    x_spec1 = pl.BlockSpec((r_tile, wp, c), lambda i: (i + 1, 0, 0))

    def full(shape):
        return pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape))

    call = pl.pallas_call(
        functools.partial(_dw_kernel, k=k, d=d, r_tile=r_tile, wo=wo,
                          act=act, leaky=leaky),
        grid=grid,
        in_specs=[x_spec0, x_spec1, full((k, k, c)), full((c,))],
        out_specs=pl.BlockSpec((r_tile, wo, c), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n_tiles * r_tile, wo, c), dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('arbitrary',),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )
    return call, (hp, wp, wo, halo, n_tiles)


def depthwise_conv(x, kernel, bias, *, dilation=1, act=True, leaky=False,
                   r_tile=32, interpret=False):
    """Stride-1 'SAME' depthwise conv + bias + activation.

    x: (N, H, W, C); kernel: (K, K, 1, C) HWIO with I==1 (grouped
    layout of ``feature_group_count=C``); bias: (C,).
    Returns (N, H, W, C).
    """
    n, h, w, c = x.shape
    k = kernel.shape[0]
    wd = jnp.asarray(kernel, x.dtype).reshape(k, k, c)
    bd = jnp.asarray(bias, x.dtype)

    call, geom = _make_dw_call(h, w, c, k, dilation, r_tile,
                               jnp.dtype(x.dtype).name, act, leaky,
                               interpret)
    hp, wp, wo, halo, n_tiles = geom
    xp = jnp.pad(x, ((0, 0), (halo, hp - h - halo),
                     (halo, wp - w - halo), (0, 0)))

    def one(xi):
        return call(xi, xi, wd, bd)

    y = jax.vmap(one)(xp) if n > 1 else one(xp[0])[None]
    return y[:, :h, :w, :]
