"""Pallas fused ShuffleNetV2K block kernels.

The XLA backbone forward is HBM-bandwidth-bound with 44% of device time
spent in layout-conversion copies between the depthwise and pointwise
convolutions (docs/perf.md). This module fuses one whole non-first
InvertedResidualK block — split, 1x1 conv, KxK depthwise, 1x1 conv,
channel interleave (``basenetworks.py::InvertedResidualK``, reference
``basenetworks.py:186-242``) — into a single Pallas kernel: the block's
activations stay resident in VMEM, and HBM sees exactly one read of the
input and one write of the output.

Design points that make the kernel Mosaic-friendly AND fast:

- Blocks chain through *halo-padded, flattened* HBM arrays: logical
  ``(B, H+2h, Wa, Ca)`` with a zero frame of ``halo`` cells, stored as
  ``(B, (H+2h)*Wa, Ca)``. ``Wa``/``Ca`` are tile-aligned (sublane /
  lane), so the 4D<->2D reshape is layout-free and every DMA is a
  contiguous, tile-aligned row-range of a 2D array. The zero frame
  doubles as the depthwise conv's zero padding, read directly from the
  array; each kernel writes its own output frame, so the layout is
  closed under composition.
- The two channel halves (passthrough x1 / branch x2) are *separate
  arrays*: no DMA ever slices channels (Cb=174 is lane-misaligned).
- The channel interleave (shuffle) is folded into the second 1x1 conv
  as static scatter matrices: the interleaved output channels
  ``[0, Cb)`` / ``[Cb, 2Cb)`` (= the *next* block's x1/x2 halves) are
  produced directly as ``act(z @ w3a + x1 @ s1a + b3a)`` etc., where
  w3a/w3b hold the conv columns scattered to their interleaved
  positions and s1a/s1b are one-hot column selectors for the
  passthrough half. Exact because block inputs are post-ReLU (x1 >= 0)
  and one-hot matmul columns copy values exactly.
- In flattened space the matmuls are single large 2D dots per stage
  (MXU-efficient), and each depthwise tap is a row-offset slice
  ``ki*d*Wa`` (sublane-aligned) plus a small in-row shift ``kj*d``
  (cheap sublane rotate); wrap-around reads at row ends land in the
  zero frame of the neighbouring row, which is exactly the conv's
  padding.
"""

import dataclasses
import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


SUBLANE = 16   # W-dim / flat-row alignment (bf16 sublane tile)
LANE = 128     # C-dim alignment


def _round_up(v, m):
    return -(-v // m) * m


@dataclasses.dataclass
class BlockWeights:
    """BN-folded weights of one non-first InvertedResidualK block with
    the channel interleave pre-scattered (module docstring). All
    matrices are zero-padded from Cb to Ca = round_up(Cb, LANE)."""
    w1: Any    # (Ca, Ca) first 1x1, folded
    b1: Any    # (Ca,)
    wdw: Any   # (k, k, Ca) depthwise
    bdw: Any   # (Ca,)
    w3a: Any   # (Ca, Ca) second 1x1 -> interleaved channels [0, Cb)
    w3b: Any   # (Ca, Ca) second 1x1 -> interleaved channels [Cb, 2Cb)
    s1a: Any   # (Ca, Ca) passthrough scatter -> channels [0, Cb)
    s1b: Any   # (Ca, Ca) passthrough scatter -> channels [Cb, 2Cb)
    b3a: Any   # (Ca,)
    b3b: Any   # (Ca,)

    def cast(self, dtype):
        return jax.tree_util.tree_map(
            lambda a: jnp.asarray(a, dtype), self)


jax.tree_util.register_dataclass(
    BlockWeights,
    data_fields=['w1', 'b1', 'wdw', 'bdw', 'w3a', 'w3b', 's1a', 's1b',
                 'b3a', 'b3b'],
    meta_fields=[])


def pad_half(x, halo):
    """(B, H, W, Cb) -> (B, (H+2h)*Wa, Ca) flat halo-padded layout.

    Wa/Ca are tile-aligned: Mosaic only lowers tile-aligned memref
    slices, and the tiled HBM layout materializes this padding anyway.
    The zero-padded channels stay zero through the whole fused chain
    (zero weight rows/columns)."""
    b, height, width, cb = x.shape
    wa = _round_up(width + 2 * halo, SUBLANE)
    ca = _round_up(cb, LANE)
    xp = jnp.pad(x, ((0, 0), (halo, halo),
                     (halo, wa - width - halo), (0, ca - cb)))
    return xp.reshape(b, (height + 2 * halo) * wa, ca)


def unpad_half(xf, halo, height, width, cb):
    wa = xf.shape[1] // (height + 2 * halo)
    xp = xf.reshape(xf.shape[0], height + 2 * halo, wa, xf.shape[-1])
    return xp[:, halo:halo + height, halo:halo + width, :cb]


def _block_kernel(x1_ref, x2_ref, w1_ref, b1_ref, wdw_ref, bdw_ref,
                  w3a_ref, w3b_ref, s1a_ref, s1b_ref, b3a_ref, b3b_ref,
                  y1m_ref, outm_ref, outa_ref, outb_ref,
                  x2_s, x1_s, y1_s, outa_s, outb_s, zero_s, sems, *,
                  k, dilation, th, height, width, wa, ca, leaky,
                  acc_dtype, ablate=()):
    h = (k - 1) // 2 * dilation
    n = (th + 2 * h) * wa        # x2/y1 rows incl. halo
    m = th * wa                  # output rows
    tail = _round_up(2 * h, SUBLANE)
    b = pl.program_id(0)
    i = pl.program_id(1)
    n_i = pl.num_programs(1)
    start = jnp.minimum(i * th, height - th)  # ragged last tile: clamp

    # contiguous row-range DMAs in the flat layout: x2 rows incl. halo,
    # x1 interior rows (+1 sublane tile so the in-row shift by halo
    # can be taken as a value slice)
    in2 = pltpu.make_async_copy(x2_ref.at[b, pl.ds(start * wa, n)],
                                x2_s, sems.at[0])
    in1 = pltpu.make_async_copy(
        x1_ref.at[b, pl.ds((start + h) * wa, m + SUBLANE)],
        x1_s, sems.at[1])
    in2.start()
    in1.start()
    in2.wait()

    dtype = outa_ref.dtype

    def act(v):
        return jnp.where(v > 0, v, v * 0.01) if leaky else jnp.maximum(v, 0)

    # first 1x1 as ONE large dot (computed on the halo and frame too:
    # 2h rows + frame cols of recompute); then restore the depthwise
    # conv's zero padding — a 1x1 of a zero-frame cell is
    # relu(b1) != 0, so frame cells are masked back to zero. y1m is the
    # static column mask (period Wa); out-of-image halo rows are zeroed
    # by the edge programs below (interior tiles have none).
    y1 = jnp.dot(x2_s[pl.ds(0, n)], w1_ref[:],
                 preferred_element_type=jnp.float32)
    y1 = act(y1 + b1_ref[:].astype(jnp.float32))
    # multiplicative 0/1 mask (packed-bf16 compares don't lower; every
    # masked value is finite — frames are true zeros, tails memset)
    y1_s[pl.ds(0, n)] = (y1 * y1m_ref[:].astype(jnp.float32)).astype(
        acc_dtype)
    y1_s[pl.ds(n, tail)] = jnp.zeros((tail, ca), acc_dtype)

    @pl.when(i == 0)
    def _():  # padded rows [0, h) are outside the image
        y1_s[pl.ds(0, h * wa)] = jnp.zeros((h * wa, ca), acc_dtype)

    @pl.when(i == n_i - 1)
    def _():  # padded rows [height+h, height+2h)
        y1_s[pl.ds((th + h) * wa, h * wa)] = jnp.zeros((h * wa, ca),
                                                       acc_dtype)

    # depthwise KxK as a shifted-add stencil over the VMEM-resident y1:
    # output cell (l, c') (interior-aligned cols) reads flat
    # y1[m' + d*(ki*wa + kj)] — row offsets are sublane-aligned, the
    # in-row part is a small rotate; row-end wrap reads the next row's
    # zero frame, which is exactly the conv padding
    acc = jnp.broadcast_to(bdw_ref[:].astype(acc_dtype), (m, ca))
    acc = acc.astype(acc_dtype)
    taps = () if 'taps' in ablate else tuple(
        (ki, kj) for ki in range(k) for kj in range(k))
    if 'center' in ablate:
        taps = ((k // 2, k // 2),)
    for ki, kj in taps:
        tap = y1_s[pl.ds(dilation * (ki * wa + kj), m)]
        acc = acc + tap * wdw_ref[ki, kj, :].astype(acc_dtype)

    # second 1x1 with the interleave folded in; the passthrough half
    # rides one-hot matmuls into its scattered positions
    in1.wait()
    z = acc.astype(dtype)
    x1v = x1_s[pl.ds(h, m)]
    outm = outm_ref[:].astype(jnp.float32)
    zeros_h = jnp.zeros((h, ca), dtype)
    for w3_ref, s1_ref, b3_ref, out_s in (
            (w3a_ref, s1a_ref, b3a_ref, outa_s),
            (w3b_ref, s1b_ref, b3b_ref, outb_s)):
        v = jnp.dot(z, w3_ref[:], preferred_element_type=jnp.float32)
        if 'x1dot' not in ablate:
            v = v + jnp.dot(x1v, s1_ref[:],
                            preferred_element_type=jnp.float32)
        v = act(v + b3_ref[:].astype(jnp.float32))
        if 'outmask' not in ablate:
            v = (v * outm).astype(dtype)
        else:
            v = v.astype(dtype)
        # shift interior-aligned cols to the padded layout (+h): the
        # dropped tail is the last row's right frame (zeros), covered
        # by the next tile / the bottom frame
        out_s[:] = jnp.concatenate([zeros_h, v[0:m - h]], axis=0)

    outa = pltpu.make_async_copy(
        outa_s, outa_ref.at[b, pl.ds((start + h) * wa, m)], sems.at[2])
    outb = pltpu.make_async_copy(
        outb_s, outb_ref.at[b, pl.ds((start + h) * wa, m)], sems.at[3])
    outa.start()
    outb.start()

    # zero frame rows of the outputs (top and bottom programs only)
    @pl.when((i == 0) | (i == n_i - 1))
    def _():
        zero_s[:] = jnp.zeros((h * wa, ca), dtype)

    @pl.when(i == 0)
    def _():
        for j, ref in enumerate((outa_ref, outb_ref)):
            top = pltpu.make_async_copy(
                zero_s, ref.at[b, pl.ds(0, h * wa)], sems.at[4 + j])
            top.start()
            top.wait()

    @pl.when(i == n_i - 1)
    def _():
        for j, ref in enumerate((outa_ref, outb_ref)):
            bot = pltpu.make_async_copy(
                zero_s, ref.at[b, pl.ds((height + h) * wa, h * wa)],
                sems.at[4 + j])
            bot.start()
            bot.wait()

    outa.wait()
    outb.wait()


def fused_block(x1f, x2f, weights: BlockWeights, *, height, width,
                k=5, dilation=1, tile_rows=16, leaky=False,
                acc_dtype=jnp.float32, interpret=False,
                vmem_limit_bytes=100 * 1024 * 1024, ablate=()):
    """One non-first InvertedResidualK block on flat halo-padded halves.

    x1f/x2f: (B, (H+2h)*Wa, Ca) passthrough/branch halves in the
    ``pad_half`` layout; returns (outa, outb) in the same layout — the
    interleaved output's halves, i.e. the next block's (x1, x2).
    """
    h = (k - 1) // 2 * dilation
    batch, flat, ca = x1f.shape
    wa = flat // (height + 2 * h)
    th = min(tile_rows, height)
    n_i = -(-height // th)
    dtype = x1f.dtype
    n = (th + 2 * h) * wa
    m = th * wa
    tail = _round_up(2 * h, SUBLANE)

    # static masks, period Wa: y1 valid cols [h, h+width) of each row;
    # out tiles are interior-aligned (valid cols [0, width))
    col = np.arange(wa)
    y1m = np.tile(((col >= h) & (col < width + h)), th + 2 * h)
    outm = np.tile(col < width, th)
    y1m = jnp.asarray(y1m.astype(np.float32)[:, None], dtype)
    outm = jnp.asarray(outm.astype(np.float32)[:, None], dtype)

    kernel = functools.partial(
        _block_kernel, k=k, dilation=dilation, th=th, height=height,
        width=width, wa=wa, ca=ca, leaky=leaky, acc_dtype=acc_dtype,
        ablate=ablate)
    # the chained activations are pinned to HBM: under ANY the compiler
    # places them in VMEM when they fit, evicting the kernel's scratch
    # (scoped-vmem OOM) and serializing the pipeline
    hbm = pl.BlockSpec(memory_space=pltpu.HBM)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    half = jax.ShapeDtypeStruct((batch, flat, ca), dtype)
    return pl.pallas_call(
        kernel,
        grid=(batch, n_i),
        in_specs=[hbm, hbm] + [vmem] * 12,
        out_specs=(hbm, hbm),
        out_shape=(half, half),
        scratch_shapes=[
            pltpu.VMEM((n, ca), dtype),                    # x2 + halo
            pltpu.VMEM((m + SUBLANE, ca), dtype),          # x1 interior
            pltpu.VMEM((n + tail, ca), acc_dtype),         # y1
            pltpu.VMEM((m, ca), dtype),                    # out half a
            pltpu.VMEM((m, ca), dtype),                    # out half b
            pltpu.VMEM((h * wa, ca), dtype),               # zero frame
            pltpu.SemaphoreType.DMA((6,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=vmem_limit_bytes,
            dimension_semantics=('parallel', 'arbitrary')),
        interpret=interpret,
    )(x1f, x2f, weights.w1, weights.b1, weights.wdw, weights.bdw,
      weights.w3a, weights.w3b, weights.s1a, weights.s1b,
      weights.b3a, weights.b3b, y1m, outm)


def block_weights_from_folded(block) -> BlockWeights:
    """BlockWeights from a fused_inference.FoldedBlock (non-first),
    scattering the interleave into w3a/w3b/s1a/s1b (module docstring).

    Interleaved channel 2j is x1[j], channel 2j+1 is branch[j]
    (``channel_interleave2``); half A is interleaved channels [0, Cb),
    half B is [Cb, 2Cb).
    """
    cna0, cna1, cna2 = block.convs
    w3_half = np.asarray(cna2.kernel, np.float32)[0, 0]     # (Cb, Cb)
    b3_half = np.asarray(cna2.bias, np.float32)
    cb = w3_half.shape[0]
    ca = _round_up(cb, LANE)  # match the pad_half channel padding

    def mat(mtx):  # (cb, cb) -> (ca, ca), zero-padded
        out = np.zeros((ca, ca), np.float32)
        out[:cb, :cb] = mtx
        return jnp.asarray(out)

    def vec(v):
        return jnp.asarray(np.pad(np.asarray(v, np.float32), (0, ca - cb)))

    w3 = np.zeros((cb, 2 * cb), np.float32)
    w3[:, 1::2] = w3_half
    s1 = np.zeros((cb, 2 * cb), np.float32)
    s1[np.arange(cb), 2 * np.arange(cb)] = 1.0
    b3 = np.zeros((2 * cb,), np.float32)
    b3[1::2] = b3_half
    wdw = np.asarray(cna1.kernel, np.float32)[:, :, 0, :]
    return BlockWeights(
        w1=mat(np.asarray(cna0.kernel, np.float32)[0, 0]),
        b1=vec(cna0.bias),
        wdw=jnp.asarray(np.pad(wdw, ((0, 0), (0, 0), (0, ca - cb)))),
        bdw=vec(cna1.bias),
        w3a=mat(w3[:, :cb]),
        w3b=mat(w3[:, cb:]),
        s1a=mat(s1[:, :cb]),
        s1b=mat(s1[:, cb:]),
        b3a=vec(b3[:cb]),
        b3b=vec(b3[cb:]),
    )
