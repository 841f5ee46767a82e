"""Fused branch2 Pallas kernel for ShuffleNetV2K repeat blocks.

Why this exists: on the plain XLA path, 44% of the k16 serving forward
is layout-conversion copies around the depthwise stages (docs/perf.md).
Isolated, XLA's conv1+dw+conv3 chain is fast — the copies appear
*in-graph* where layout assignment must reconcile the depthwise conv's
preferred layout with the 1x1 convs and the channel-shuffle interleave
on both sides of every block. This kernel keeps one repeat block's
branch2 (1x1 conv -> KxK depthwise -> 1x1 conv, with ReLUs) entirely
VMEM-resident: the activation is read from HBM once and the branch
output written once, with zero intermediate layout traffic.

Design notes (all Mosaic-legality constraints measured on v5e):
- The channel shuffle stays in XLA. Lane interleaves are not
  expressible in Mosaic on this toolchain (``stack+reshape``,
  ``jnp.repeat`` and strided lane reads all fail to compile), and XLA
  executes the interleave as a single fused pad+copy at HBM
  speed-of-light — there is nothing to win by moving it.
- The split also stays out of the kernel: ShuffleNet's channel halves
  (174/348/696 for k16) are not 128-lane aligned, and Mosaic DMA
  requires lane-tile-aligned minor dims. Instead the kernel reads the
  *full* (2c)-channel activation and folds the split into the first
  1x1 conv as zero weight rows for the passthrough half — the MXU
  contraction widens from c to 2c lanes, which is cheaper than any
  physical rearrangement of misaligned halves.
- Halo: the depthwise conv needs +/- halo rows per output row tile.
  BlockSpec index maps cannot express overlapping windows, so the
  kernel takes the same input array through TWO block views (row tiles
  i and i+1) and concatenates along the (major) row axis in VMEM;
  the input carries one extra all-zero row tile at the bottom.
- Bias/ReLU on padding: conv1's bias makes y1 = relu(b1) != 0 in the
  padded border, which would corrupt the depthwise taps. y1 is masked
  back to zero outside the valid data region (two iota compares).

Reference counterpart: the torch reference runs these blocks as
ordinary cuDNN/oneDNN convs (``network/basenetworks.py:186-242``); the
fusion boundary (full block residency) is TPU-specific.
"""

import dataclasses
import functools
from typing import Any, List

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .basenetworks import channel_interleave2


def _round_up(v: int, m: int) -> int:
    return (v + m - 1) // m * m


@dataclasses.dataclass
class Branch2Weights:
    """Weights of one repeat block's branch2, prepared for the kernel.

    ``w1z`` is the first 1x1 conv with the channel split folded in:
    shape (c2p, cm) where rows [c, 2c) hold the conv's (c, c) kernel
    (the x2 half) and all other rows are zero.
    """
    w1z: Any   # (c2p, cm)
    b1: Any    # (cm,) f32
    wd: Any    # (k, k, cm) f32
    bd: Any    # (cm,) f32
    w3: Any    # (cm, cm)
    b3: Any    # (cm,) f32
    leaky: bool = False

    def cast(self, dtype):
        return dataclasses.replace(
            self,
            w1z=jnp.asarray(self.w1z, dtype),
            b1=jnp.asarray(self.b1, jnp.float32),
            wd=jnp.asarray(self.wd, jnp.float32),
            bd=jnp.asarray(self.bd, jnp.float32),
            w3=jnp.asarray(self.w3, dtype),
            b3=jnp.asarray(self.b3, jnp.float32))


jax.tree_util.register_dataclass(
    Branch2Weights, data_fields=['w1z', 'b1', 'wd', 'bd', 'w3', 'b3'],
    meta_fields=['leaky'])


def branch2_weights_from_folded(block, c2p: int, cm: int) -> Branch2Weights:
    """Prepare one non-first FoldedBlock's convs for the kernel.

    ``block.convs`` = [1x1 (c->c), dw KxK (groups=c, no act), 1x1]
    (fused_inference.fold_shufflenet block layout).
    """
    pw1, dw, pw3 = block.convs
    c = pw1.kernel.shape[2]
    assert pw1.kernel.shape[:2] == (1, 1)
    k = dw.kernel.shape[0]
    assert dw.groups == c and dw.kernel.shape[2] == 1

    w1z = np.zeros((c2p, cm), np.float32)
    w1z[c:2 * c, :c] = np.asarray(pw1.kernel, np.float32)[0, 0]
    b1 = np.zeros((cm,), np.float32)
    b1[:c] = np.asarray(pw1.bias, np.float32)
    wd = np.zeros((k, k, cm), np.float32)
    wd[:, :, :c] = np.asarray(dw.kernel, np.float32)[:, :, 0, :]
    bd = np.zeros((cm,), np.float32)
    bd[:c] = np.asarray(dw.bias, np.float32)
    w3 = np.zeros((cm, cm), np.float32)
    w3[:c, :c] = np.asarray(pw3.kernel, np.float32)[0, 0]
    b3 = np.zeros((cm,), np.float32)
    b3[:c] = np.asarray(pw3.bias, np.float32)
    return Branch2Weights(
        w1z=w1z, b1=b1, wd=wd, bd=bd, w3=w3, b3=b3,
        leaky=pw1.non_linearity == 'leaky_relu')


def _branch2_kernel(x0_ref, x1_ref, w1_ref, b1_ref, wd_ref, bd_ref,
                    w3_ref, b3_ref, o_ref, *, k, d, r_tile, wp, wo,
                    h, w, leaky):
    """One row tile of branch2: y3 = relu(w3 . dw(relu(w1z . x))).

    x0/x1 are row tiles i and i+1 of the padded input (r_tile, wp, c2p);
    the output tile is (r_tile, wo, cm). Data rows/cols start at
    ``halo`` in the padded array; the output tile's row r maps to
    padded row i*r_tile + r + halo, i.e. out[r, j] consumes padded
    rows [i*rt + r, i*rt + r + 2*halo] — exactly the concat window.
    """
    i = pl.program_id(0)
    halo = (k - 1) // 2 * d
    win = jnp.concatenate([x0_ref[...], x1_ref[...]], axis=0)
    win = win[:r_tile + 2 * halo]
    rp = r_tile + 2 * halo
    c2p = win.shape[-1]
    cm = w1_ref.shape[-1]

    def act(v):
        return jnp.where(v > 0, v, v * 0.01) if leaky else jnp.maximum(v, 0.0)

    y1 = jax.lax.dot_general(
        win.reshape(rp * wp, c2p), w1_ref[...],
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    y1 = act(y1 + b1_ref[...]).reshape(rp, wp, cm)

    # zero the padded border (bias+relu made it nonzero); valid data
    # lives at padded rows [halo, h + halo) and cols [halo, w + halo)
    row = jax.lax.broadcasted_iota(jnp.int32, (rp, wp, 1), 0) \
        + i * r_tile
    col = jax.lax.broadcasted_iota(jnp.int32, (rp, wp, 1), 1)
    valid = ((row >= halo) & (row < h + halo)
             & (col >= halo) & (col < w + halo))
    y1 = jnp.where(valid, y1, 0.0)

    acc = None
    for dy in range(k):
        for dx in range(k):
            term = y1[dy * d:dy * d + r_tile, dx * d:dx * d + wo, :] \
                * wd_ref[dy, dx, :]
            acc = term if acc is None else acc + term
    z = acc + bd_ref[...]

    y3 = jax.lax.dot_general(
        z.reshape(r_tile * wo, cm).astype(x0_ref.dtype), w3_ref[...],
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    y3 = act(y3 + b3_ref[...])
    o_ref[...] = y3.reshape(r_tile, wo, cm).astype(x0_ref.dtype)


@functools.lru_cache(maxsize=64)
def _make_branch2_call(h, w, c2p, cm, k, d, r_tile, dtype_name, leaky,
                       interpret):
    """Build (pallas_call, geometry) for one block shape."""
    dtype = jnp.dtype(dtype_name)
    halo = (k - 1) // 2 * d
    # the dual-block-view halo trick reads rows [i*rt, i*rt + rt + 2*halo)
    # from tiles i and i+1 only; a smaller r_tile would need tile i+2 and
    # fails later with an opaque reshape error at trace time
    assert r_tile >= 2 * halo, (
        f'r_tile={r_tile} must be >= 2*halo={2 * halo} '
        f'(k={k}, dilation={d})')
    n_tiles = -(-h // r_tile)
    wo = _round_up(w, 8)
    wp = wo + _round_up(2 * halo, 8)
    hp = (n_tiles + 1) * r_tile  # one extra all-zero tile for the i+1 view

    grid = (n_tiles,)
    x_spec0 = pl.BlockSpec((r_tile, wp, c2p), lambda i: (i, 0, 0))
    x_spec1 = pl.BlockSpec((r_tile, wp, c2p), lambda i: (i + 1, 0, 0))

    def full(shape):
        return pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape))

    call = pl.pallas_call(
        functools.partial(_branch2_kernel, k=k, d=d, r_tile=r_tile,
                          wp=wp, wo=wo, h=h, w=w, leaky=leaky),
        grid=grid,
        in_specs=[x_spec0, x_spec1,
                  full((c2p, cm)), full((cm,)), full((k, k, cm)),
                  full((cm,)), full((cm, cm)), full((cm,))],
        out_specs=pl.BlockSpec((r_tile, wo, cm), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n_tiles * r_tile, wo, cm), dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('arbitrary',),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )
    return call, (hp, wp, wo, halo, n_tiles)


def branch2_apply(xp, weights: Branch2Weights, *, h, w, k, d, r_tile,
                  interpret=False):
    """Run the kernel on a padded activation (hp, wp, c2p) -> y3 tile
    array (n_tiles*r_tile, wo, cm). The caller slices [:h, :w, :c]."""
    c2p = xp.shape[-1]
    cm = weights.w1z.shape[-1]
    call, geom = _make_branch2_call(
        h, w, c2p, cm, k, d, r_tile, jnp.dtype(xp.dtype).name,
        weights.leaky, interpret)
    hp, wp, wo, halo, n_tiles = geom
    assert xp.shape == (hp, wp, c2p), (xp.shape, (hp, wp, c2p))
    return call(xp, xp, weights.w1z, weights.b1, weights.wd, weights.bd,
                weights.w3, weights.b3)


def pad_activation(x, *, h, w, k, d, r_tile, c2p):
    """Zero-pad (h, w, 2c) -> the kernel's (hp, wp, c2p) layout."""
    halo = (k - 1) // 2 * d
    n_tiles = -(-h // r_tile)
    wo = _round_up(w, 8)
    wp = wo + _round_up(2 * halo, 8)
    hp = (n_tiles + 1) * r_tile
    c2 = x.shape[-1]
    return jnp.pad(x, ((halo, hp - h - halo),
                       (halo, wp - w - halo),
                       (0, c2p - c2)))


def run_segment(x, weights_list: List[Branch2Weights], *, k, d, r_tile,
                interpret=False):
    """Chain of repeat blocks on one (h, w, 2c) activation (no batch).

    Per block: the kernel computes branch2; XLA performs the channel
    shuffle (slice passthrough half + interleave with y3 + re-pad) as
    one fused copy — measured at HBM speed-of-light (docs/perf.md).
    """
    h, w, c2 = x.shape
    c = c2 // 2
    c2p = _round_up(c2, 128)
    halo = (k - 1) // 2 * d
    xp = pad_activation(x, h=h, w=w, k=k, d=d, r_tile=r_tile, c2p=c2p)
    wo = _round_up(w, 8)
    wp = wo + _round_up(2 * halo, 8)
    for idx, bw in enumerate(weights_list):
        y3 = branch2_apply(xp, bw, h=h, w=w, k=k, d=d, r_tile=r_tile,
                           interpret=interpret)
        x1 = lax.slice(xp, (halo, halo, 0), (halo + h, halo + w, c))
        y3 = lax.slice(y3, (0, 0, 0), (h, w, c))
        nxt = channel_interleave2(x1[None], y3[None])[0]
        if idx + 1 == len(weights_list):
            return nxt
        xp = jnp.pad(nxt, ((halo, xp.shape[0] - h - halo),
                           (halo, wp - w - halo),
                           (0, c2p - c2)))
    return x


def build_mosaic_forward(base_net, folded, *, dtype=jnp.bfloat16,
                         r_tile=16, interpret=False):
    """Forward fn: XLA stem/first-blocks/conv5, Pallas repeat blocks.

    Mirrors fused_inference.build_pallas_forward's segment grouping but
    uses the branch2 kernel (full-block VMEM residency, shuffle in
    XLA). Operates on a single image (h, w, 3); vmap for batches.
    """
    from .fused_inference import FoldedBlock

    k = base_net.kernel
    folded = folded.cast(dtype)

    ops = list(folded.blocks) + list(folded.conv5)
    dilations = []
    for repeats, dd in zip(base_net.stages_repeats,
                           [1, 1, base_net.stage4_dilation]):
        dilations += [dd] * repeats
    dilations += [base_net.stage4_dilation] * len(folded.conv5)

    segments = []  # ('xla', op, None) | ('fused', [weights...], d)
    for op, dd in zip(ops, dilations):
        fusable = (isinstance(op, FoldedBlock) and not op.first_in_stage
                   and all(cv.stride == 1 for cv in op.convs)
                   and op.convs[1].kernel.shape[0] == k)
        if fusable:
            c = op.convs[0].kernel.shape[2]
            c2p = _round_up(2 * c, 128)
            cm = _round_up(c, 128)
            bw = branch2_weights_from_folded(op, c2p, cm).cast(dtype)
            if segments and segments[-1][0] == 'fused' \
                    and segments[-1][2] == dd:
                segments[-1][1].append(bw)
            else:
                segments.append(('fused', [bw], dd))
        else:
            segments.append(('xla', op, None))

    stem = folded.stem

    def forward_single(x):
        # x: (h, w, 3) single image
        x = x.astype(dtype)[None]
        for conv in stem:
            x = conv(x)
        for kind, payload, dd in segments:
            if kind == 'xla':
                x = payload(x)
                continue
            x = run_segment(x[0], payload, k=k, d=dd, r_tile=r_tile,
                            interpret=interpret)[None]
        return x[0]

    def forward(x):
        if x.ndim == 3:
            return forward_single(x)
        if x.shape[0] == 1:
            return forward_single(x[0])[None]
        return jax.vmap(forward_single)(x)

    return forward
