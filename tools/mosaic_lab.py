"""Mosaic microbenchmarks for the fused-block kernel design.

Times the risky primitives in isolation at real k16 stage geometries:
  interleave : lane interleave (channel_shuffle's core) in-kernel vs XLA
  dw         : 5x5 depthwise as in-VMEM shifted adds vs XLA conv
  block      : full repeat-block (conv1+dw+conv3+relu+interleave) kernel

Usage: python tools/mosaic_lab.py [names...]
"""

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import bench

# k16 stage geometries: (H, W, half_channels)
STAGES = {
    'stage2': (121, 161, 174),
    'stage3': (61, 81, 348),
    'stage4': (31, 41, 696),
}


def _rng(*shape):
    return np.random.RandomState(0).randn(*shape).astype(np.float32)


def scalarize(out):
    return sum(jnp.sum(o.astype(jnp.float32)) for o in
               jax.tree_util.tree_leaves(out)) * 1e-20


# ---------------------------------------------------------------- interleave

def lane_interleave(a, b):
    """out[..., 2i] = a[..., i]; out[..., 2i+1] = b[..., i].

    Mosaic only supports non-no-op minor-dim insertion for 32-bit types,
    so the stack/reshape runs in f32 and casts back.
    """
    r, w, c = a.shape
    out32 = jnp.stack([a.astype(jnp.float32), b.astype(jnp.float32)],
                      axis=-1).reshape(r, w, 2 * c)
    return out32.astype(a.dtype)


def interleave_kernel(a_ref, b_ref, out_ref):
    out_ref[...] = lane_interleave(a_ref[...], b_ref[...])


def bench_interleave(name, h, w, c, dtype=jnp.bfloat16):
    a = jnp.asarray(_rng(h, w, c), dtype)
    b = jnp.asarray(_rng(h, w, c), dtype)

    call = pl.pallas_call(
        interleave_kernel,
        out_shape=jax.ShapeDtypeStruct((h, w, 2 * c), dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )

    t = bench.time_op(lambda s: scalarize(call(a + s.astype(dtype) * 0, b)))
    print(f'{name} interleave pallas : {t*1e6:9.1f} us')

    @jax.jit
    def xla(a, b):
        return jnp.stack([a, b], axis=-1).reshape(h, w, 2 * c)

    t = bench.time_op(lambda s: scalarize(xla(a + s.astype(dtype) * 0, b)))
    print(f'{name} interleave xla    : {t*1e6:9.1f} us')


# ------------------------------------------------------------------------ dw

def dw_kernel(x_ref, w_ref, out_ref, *, k, r, w):
    acc = None
    for dy in range(k):
        for dx in range(k):
            term = x_ref[dy:dy + r, dx:dx + w, :] * w_ref[dy, dx, :]
            acc = term if acc is None else acc + term
    out_ref[...] = acc


def bench_dw(name, h, w, c, k=5, dtype=jnp.bfloat16):
    pad = k // 2
    x = jnp.asarray(_rng(h + 2 * pad, w + 2 * pad, c), dtype)
    wt = jnp.asarray(_rng(k, k, c), dtype)

    call = pl.pallas_call(
        functools.partial(dw_kernel, k=k, r=h, w=w),
        out_shape=jax.ShapeDtypeStruct((h, w, c), dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    t = bench.time_op(lambda s: scalarize(call(x + s.astype(dtype) * 0, wt)))
    print(f'{name} dw5x5 pallas      : {t*1e6:9.1f} us')

    @jax.jit
    def xla(x, wt):
        return jax.lax.conv_general_dilated(
            x[None], wt[:, :, None, :], (1, 1), 'VALID',
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
            feature_group_count=c)[0]

    t = bench.time_op(lambda s: scalarize(xla(x + s.astype(dtype) * 0, wt)))
    print(f'{name} dw5x5 xla conv    : {t*1e6:9.1f} us')


# --------------------------------------------------------------------- block

def _round_up(v, m):
    return (v + m - 1) // m * m


def branch2_kernel(x2_ref, w1_ref, b1_ref, wd_ref, bd_ref,
                   w3_ref, b3_ref, o_ref, scratch, sem, *, k,
                   r_tile, wi, wo):
    """branch2 of a repeat block: y1 = relu(x2 @ w1 + b1) on the haloed
    extent, z = dw5x5(y1), y3 = relu(z @ w3 + b3). No interleave — the
    caller keeps the channel shuffle in XLA land.

    Grid over row tiles with a manual halo DMA (x2 stays in HBM; rows
    [i*rt, i*rt+rt+2p) stream into a VMEM scratch). Mosaic requires the
    collapsed second-minor dim of a reshape to be a sublane multiple
    (16 for bf16), so the input width wi and output width wo are padded
    independently (wi >= wo + 2*pad, both 16-multiples)."""
    i = pl.program_id(0)
    pad = k // 2
    cp = pltpu.make_async_copy(
        x2_ref.at[pl.ds(i * r_tile, r_tile + 2 * pad)], scratch, sem)
    cp.start()
    cp.wait()

    x2 = scratch[...]
    rp, _, c = x2.shape
    y1 = jnp.dot(x2.reshape(rp * wi, c), w1_ref[...],
                 preferred_element_type=jnp.float32)
    y1 = jnp.maximum(y1 + b1_ref[...], 0.0).reshape(rp, wi, c) \
        .astype(x2.dtype)

    acc = None
    for dy in range(k):
        for dx in range(k):
            term = (y1[dy:dy + r_tile, dx:dx + wo, :].astype(jnp.float32)
                    * wd_ref[dy, dx, :])
            acc = term if acc is None else acc + term
    z = (acc + bd_ref[...]).astype(x2.dtype)

    y3 = jnp.dot(z.reshape(r_tile * wo, c), w3_ref[...],
                 preferred_element_type=jnp.float32)
    y3 = jnp.maximum(y3 + b3_ref[...], 0.0)
    o_ref[...] = y3.reshape(r_tile, wo, c).astype(x2.dtype)


def build_branch2(h, w, c, k, r_tile, dtype):
    """pallas_call for branch2 at (h, w, c); input must be
    (n_tiles*r_tile + 2*pad, wi, c) with x2 data in cols [0, w+2*pad)."""
    pad = k // 2
    n_tiles = (h + r_tile - 1) // r_tile
    wo = _round_up(w, 16)
    wi = _round_up(wo + 2 * pad, 16)
    return pl.pallas_call(
        functools.partial(branch2_kernel, k=k, r_tile=r_tile, wi=wi,
                          wo=wo),
        grid=(n_tiles,),
        out_shape=jax.ShapeDtypeStruct((n_tiles * r_tile, wo, c), dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 6,
        out_specs=pl.BlockSpec((r_tile, wo, c), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((r_tile + 2 * pad, wi, c), dtype),
            pltpu.SemaphoreType.DMA,
        ],
    ), n_tiles, wi, wo


def bench_branch2(name, h, w, c, k=5, dtype=jnp.bfloat16, r_tile=16):
    # Mosaic DMA slices need a 128-aligned minor dim: run the kernel at
    # cp = round_up(c, 128) lanes with zero-padded weights/activations.
    cp = _round_up(c, 128)
    pad = k // 2
    call, n_tiles, wi, wo = build_branch2(h, w, cp, k, r_tile, dtype)
    hp = n_tiles * r_tile + 2 * pad
    x2f = np.zeros((hp, wi, cp), np.float32)
    x2f[:h + 2 * pad, :w + 2 * pad, :c] = _rng(h + 2 * pad, w + 2 * pad, c)
    x2 = jnp.asarray(x2f, dtype)

    def padc(a, dims):
        widths = [(0, cp - c) if d else (0, 0) for d in dims]
        return np.pad(a, widths)

    w1 = jnp.asarray(padc(_rng(c, c), (1, 1)), dtype)
    b1 = jnp.asarray(padc(_rng(c), (1,)), jnp.float32)
    wd = jnp.asarray(padc(_rng(k, k, c), (0, 0, 1)), jnp.float32)
    bd = jnp.asarray(padc(_rng(c), (1,)), jnp.float32)
    w3 = jnp.asarray(padc(_rng(c, c), (1, 1)), dtype)
    b3 = jnp.asarray(padc(_rng(c), (1,)), jnp.float32)

    args = (x2, w1, b1, wd, bd, w3, b3)
    out = jax.block_until_ready(jax.jit(call)(*args))[:h, :w, :c]

    # correctness vs XLA reference on the real extent
    def ref(x2, w1, b1, wd, bd, w3, b3):
        x2 = x2[:h + 2 * pad, :w + 2 * pad]
        y1 = jax.nn.relu(jnp.einsum('hwc,cd->hwd', x2.astype(jnp.float32),
                                    w1.astype(jnp.float32)) + b1)
        z = jax.lax.conv_general_dilated(
            y1[None].astype(jnp.float32), wd[:, :, None, :], (1, 1),
            'VALID', dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
            feature_group_count=cp)[0] + bd
        y3 = jax.nn.relu(jnp.einsum('hwc,cd->hwd',
                                    z.astype(dtype).astype(jnp.float32),
                                    w3.astype(jnp.float32)) + b3)
        return y3.astype(dtype)

    expect = jax.jit(ref)(*args)[:, :, :c]
    diff = jnp.max(jnp.abs(out.astype(jnp.float32)
                           - expect.astype(jnp.float32)))
    rel = float(diff) / max(float(jnp.max(jnp.abs(
        expect.astype(jnp.float32)))), 1e-6)
    t = bench.time_op(lambda s: scalarize(call(
        x2 + s.astype(dtype) * 0, *args[1:])))
    gflop = 2 * h * w * c * c * 2 / 1e9
    print(f'{name} branch2 pallas    : {t*1e6:9.1f} us '
          f'({gflop / t / 1e3:.1f} TFLOP/s useful, rtile {r_tile}, '
          f'rel diff {rel:.1e})', flush=True)
    return t


def bench_branch2_xla(name, h, w, c, k=5, dtype=jnp.bfloat16):
    """XLA formulation of the same branch2 (unpadded channels), timed."""
    pad = k // 2
    x2 = jnp.asarray(_rng(h + 2 * pad, w + 2 * pad, c), dtype)
    w1 = jnp.asarray(_rng(1, 1, c, c), dtype)
    b1 = jnp.asarray(_rng(c), jnp.float32)
    wd = jnp.asarray(_rng(k, k, 1, c), dtype)
    bd = jnp.asarray(_rng(c), jnp.float32)
    w3 = jnp.asarray(_rng(1, 1, c, c), dtype)
    b3 = jnp.asarray(_rng(c), jnp.float32)

    @jax.jit
    def xla(x2):
        y1 = jax.lax.conv_general_dilated(
            x2[None], w1, (1, 1), 'VALID',
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
        y1 = jax.nn.relu(y1 + b1).astype(dtype)
        z = jax.lax.conv_general_dilated(
            y1, wd, (1, 1), 'VALID',
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
            feature_group_count=c) + bd
        y3 = jax.lax.conv_general_dilated(
            z.astype(dtype), w3, (1, 1), 'VALID',
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
        return jax.nn.relu(y3 + b3).astype(dtype)[0]

    t = bench.time_op(lambda s: scalarize(xla(x2 + s.astype(dtype) * 0)))
    gflop = 2 * h * w * c * c * 2 / 1e9
    print(f'{name} branch2 xla       : {t*1e6:9.1f} us '
          f'({gflop / t / 1e3:.1f} TFLOP/s useful)', flush=True)
    return t


def main():
    names = sys.argv[1:] or ['dw', 'branch2']
    for stage, (h, w, c) in STAGES.items():
        for n in names:
            if n == 'interleave':
                bench_interleave(stage, h, w, c)
            elif n == 'dw':
                bench_dw(stage, h, w, c)
            elif n == 'branch2':
                bench_branch2(stage, h, w, c)
            elif n == 'branch2_xla':
                bench_branch2_xla(stage, h, w, c)
            elif n.startswith('rtile'):
                for rt in (8, 16, 24, 32, 40):
                    if rt <= h:
                        try:
                            bench_branch2(stage, h, w, c, r_tile=rt)
                        except Exception as e:
                            print(f'{stage} rtile {rt}: FAIL '
                                  f'{type(e).__name__}', flush=True)


if __name__ == '__main__':
    main()
