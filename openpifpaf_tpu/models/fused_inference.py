"""BN-folded inference engine for ShuffleNetV2K backbones.

The serving forward pass does not need BatchNorm as a separate op: with
running statistics frozen, ``BN(conv(x))`` is exactly ``conv'(x) + b``
with the scale folded into the convolution weights. The flax training
graph keeps BN explicit (XLA emits it as a separate epilogue pass over
the full activation — ~0.5 ms/forward at 641px, see docs/perf.md); this
module folds it once at setup and runs the backbone as bare
conv+bias+relu calls, which XLA fuses into the convolutions.

This is an inference *engine* over the canonical flax parameter tree —
it reads the same checkpoint layout (``ConvNormAct_i/Conv_0/kernel`` +
``BatchNorm_0`` as produced by :class:`ShuffleNetV2K`), so any trained
or converted checkpoint works unchanged. Reference counterpart: the
torch reference serves through the same nn.Module graph it trains
(``network/nets.py:7-89``); a TPU-native design separates the two.
"""

import dataclasses
from typing import Any, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from .basenetworks import BN_EPS, ShuffleNetV2K, channel_interleave2


@dataclasses.dataclass
class FoldedConv:
    """One ConvNormAct with BatchNorm folded into weight + bias."""
    kernel: Any          # (K, K, I, O) HWIO
    bias: Any            # (O,)
    stride: int = 1
    groups: int = 1
    dilation: int = 1
    act: bool = True
    non_linearity: str = 'relu'

    #: 'conv' (lax conv) | 'stencil' (matmul + shifted-add) |
    #: 'dwpallas' (stride-1 depthwise convs through the NHWC Pallas
    #: kernel in :mod:`dw_pallas`, everything else on lax conv)
    mode: str = 'conv'

    def __call__(self, x):
        k = self.kernel.shape[0]
        pad = (k - 1) // 2 * self.dilation
        if self.mode == 'dwpallas' and self.groups == x.shape[-1] \
                and k > 1 and self.stride == 1 \
                and self.kernel.shape[2] == 1:
            from . import dw_pallas
            return dw_pallas.depthwise_conv(
                x, self.kernel, self.bias, dilation=self.dilation,
                act=self.act, leaky=self.non_linearity == 'leaky_relu')
        if self.mode == 'stencil':
            y = self._stencil(x, k, pad)
        else:
            y = lax.conv_general_dilated(
                x, self.kernel.astype(x.dtype),
                window_strides=(self.stride, self.stride),
                padding=[(pad, pad), (pad, pad)],
                rhs_dilation=(self.dilation, self.dilation),
                dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
                feature_group_count=self.groups)
        y = y + self.bias.astype(x.dtype)
        if self.act:
            return (jax.nn.leaky_relu(y)
                    if self.non_linearity == 'leaky_relu' else jax.nn.relu(y))
        return y

    def _stencil(self, x, k, pad):
        """Same conv as matmul (1x1) / shifted-add taps (depthwise) /
        tap-matmul sum (dense KxK), avoiding XLA's convolution layouts.

        XLA lowers grouped/depthwise convolutions through its own layout
        assignment, inserting re-tiling copies between the depthwise
        stages and the surrounding 1x1 convs (44% of the forward,
        docs/perf.md). Expressed as pure dots + padded static slices the
        whole backbone stays in the native NHWC tiling.
        """
        w = self.kernel.astype(x.dtype)
        n, h, wd, cin = x.shape
        if k == 1 and self.groups == 1:
            y = jnp.einsum('bhwi,io->bhwo', x, w[0, 0])
            return y[:, ::self.stride, ::self.stride]
        xp = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
        ho = (h - 1) // self.stride + 1
        wo = (wd - 1) // self.stride + 1
        s, d = self.stride, self.dilation
        taps = []
        for ki in range(k):
            for kj in range(k):
                t = lax.slice(
                    xp, (0, ki * d, kj * d, 0),
                    (n, ki * d + (ho - 1) * s + 1,
                     kj * d + (wo - 1) * s + 1, cin),
                    (1, s, s, 1))
                taps.append(t)
        if self.groups == cin and w.shape[-2] == 1:
            # depthwise: per-channel scale per tap, one fused elementwise sum
            y = None
            idx = 0
            for ki in range(k):
                for kj in range(k):
                    term = taps[idx] * w[ki, kj, 0]
                    y = term if y is None else y + term
                    idx += 1
            return y
        # dense KxK (stem): sum of per-tap matmuls
        y = None
        idx = 0
        for ki in range(k):
            for kj in range(k):
                term = jnp.einsum('bhwi,io->bhwo', taps[idx], w[ki, kj])
                y = term if y is None else y + term
                idx += 1
        return y


def _fold_cna(params, stats, *, stride=1, groups=1, dilation=1, act=True,
              non_linearity='relu'):
    """Fold one ConvNormAct's BatchNorm into its conv (frozen stats)."""
    kernel = np.asarray(params['Conv_0']['kernel'])
    bn_p = params['BatchNorm_0']
    bn_s = stats['BatchNorm_0']
    scale = np.asarray(bn_p['scale'], np.float64)
    bias = np.asarray(bn_p['bias'], np.float64)
    mean = np.asarray(bn_s['mean'], np.float64)
    var = np.asarray(bn_s['var'], np.float64)
    s = scale / np.sqrt(var + BN_EPS)
    w = (kernel.astype(np.float64) * s).astype(np.float32)  # broadcast on O
    b = (bias - mean * s).astype(np.float32)
    return FoldedConv(kernel=w, bias=b, stride=stride, groups=groups,
                      dilation=dilation, act=act,
                      non_linearity=non_linearity)


@dataclasses.dataclass
class FoldedBlock:
    """InvertedResidualK with all three (or five) convs BN-folded."""
    first_in_stage: bool
    convs: List[FoldedConv]  # order matches ConvNormAct_0..N

    def __call__(self, x):
        if not self.first_in_stage:
            cna0, cna1, cna2 = self.convs
            x1, x2 = jnp.split(x, 2, axis=-1)
            y = cna2(cna1(cna0(x2)))
            return channel_interleave2(x1, y)
        dw1, pw1, pw2, dw2, pw3 = self.convs
        b1 = pw1(dw1(x))
        b2 = pw3(dw2(pw2(x)))
        return channel_interleave2(b1, b2)


@dataclasses.dataclass
class FoldedShuffleNetV2K:
    stem: List[FoldedConv]
    blocks: List[FoldedBlock]
    conv5: List[Any]  # FoldedConv or FoldedBlock

    def __call__(self, x):
        for conv in self.stem:
            x = conv(x)
        for block in self.blocks:
            x = block(x)
        for op in self.conv5:
            x = op(x)
        return x

    def cast(self, dtype):
        """Return a copy with all weights/biases in ``dtype`` (done once
        at setup — in-graph casts would keep the f32 masters in the HBM
        traffic, docs/perf.md)."""
        return jax.tree_util.tree_map(
            lambda a: jnp.asarray(a, dtype)
            if isinstance(a, (np.ndarray, jnp.ndarray)) else a, self)

    def with_mode(self, mode: str):
        """Copy with every conv's compute mode set
        (conv | stencil | dwpallas)."""
        def rewrite(op):
            if isinstance(op, FoldedConv):
                return dataclasses.replace(op, mode=mode)
            if isinstance(op, FoldedBlock):
                return dataclasses.replace(
                    op, convs=[rewrite(c) for c in op.convs])
            return op
        return FoldedShuffleNetV2K(
            stem=[rewrite(c) for c in self.stem],
            blocks=[rewrite(b) for b in self.blocks],
            conv5=[rewrite(c) for c in self.conv5])


jax.tree_util.register_dataclass(
    FoldedConv, data_fields=['kernel', 'bias'],
    meta_fields=['stride', 'groups', 'dilation', 'act', 'non_linearity',
                 'mode'])
jax.tree_util.register_dataclass(
    FoldedBlock, data_fields=['convs'], meta_fields=['first_in_stage'])
jax.tree_util.register_dataclass(
    FoldedShuffleNetV2K, data_fields=['stem', 'blocks', 'conv5'],
    meta_fields=[])


def fold_shufflenet(base_net: ShuffleNetV2K, params, batch_stats
                    ) -> Optional[FoldedShuffleNetV2K]:
    """Fold a ShuffleNetV2K parameter tree; None if unsupported.

    Mirrors ``ShuffleNetV2K.__call__``'s module instantiation order so
    the flax auto-names (``ConvNormAct_i`` / ``InvertedResidualK_i``)
    resolve identically.
    """
    if not isinstance(base_net, ShuffleNetV2K):
        return None
    if base_net.norm != 'batch':
        return None  # group/instance norm is data-dependent; cannot fold

    nl = base_net.non_linearity
    cna_i = 0
    irk_i = 0

    def next_cna(**kwargs):
        nonlocal cna_i
        name = f'ConvNormAct_{cna_i}'
        cna_i += 1
        return _fold_cna(params[name], batch_stats[name],
                         non_linearity=nl, **kwargs)

    def next_block(out_ch, in_ch, first, *, stride=1, dilation=1):
        nonlocal irk_i
        name = f'InvertedResidualK_{irk_i}'
        irk_i += 1
        p, s = params[name], batch_stats[name]
        branch = out_ch // 2
        k = base_net.kernel

        def cna(j, **kwargs):
            return _fold_cna(p[f'ConvNormAct_{j}'], s[f'ConvNormAct_{j}'],
                             non_linearity=nl, **kwargs)

        if not first:
            convs = [
                cna(0),                                             # 1x1
                cna(1, stride=stride, dilation=dilation,
                    groups=branch, act=False),                      # dw KxK
                cna(2),                                             # 1x1
            ]
        else:
            convs = [
                cna(0, stride=stride, dilation=dilation,
                    groups=in_ch, act=False),                       # b1 dw
                cna(1),                                             # b1 1x1
                cna(2),                                             # b2 1x1
                cna(3, stride=stride, dilation=dilation,
                    groups=branch, act=False),                      # b2 dw
                cna(4),                                             # b2 1x1
            ]
        return FoldedBlock(first_in_stage=first, convs=convs)

    stem = [next_cna(stride=2)]
    ch = base_net.stages_out_channels[0]
    if base_net.input_conv2_stride:
        ch = base_net.input_conv2_outchannels or ch
        stem.append(next_cna(stride=base_net.input_conv2_stride))

    blocks = []
    dilations = [1, 1, base_net.stage4_dilation]
    for repeats, out_ch, dilation in zip(base_net.stages_repeats,
                                         base_net.stages_out_channels[1:4],
                                         dilations):
        stage_stride = 2 if dilation == 1 else 1
        blocks.append(next_block(out_ch, ch, True, stride=stage_stride,
                                 dilation=dilation))
        for _ in range(repeats - 1):
            blocks.append(next_block(out_ch, out_ch, False,
                                     dilation=dilation))
        ch = out_ch

    out_ch = base_net.stages_out_channels[-1]
    if base_net.conv5_as_stage:
        conv5 = [
            next_block(out_ch, ch, ch != out_ch,
                       dilation=base_net.stage4_dilation),
            next_block(out_ch, out_ch, False,
                       dilation=base_net.stage4_dilation),
        ]
    else:
        conv5 = [next_cna()]
    return FoldedShuffleNetV2K(stem=stem, blocks=blocks, conv5=conv5)


def _halves_block(x1, x2, w, *, k, dilation, leaky):
    """One non-first block in the lane-aligned halves formulation, as
    plain XLA ops (same math as the Pallas kernel, see shuffle_pallas):
    both channel halves are separate Ca-channel arrays (Ca a lane
    multiple), the shuffle lives in the static scatter matrices, and
    the graph contains no split/concat/interleave ops at all — only
    aligned 1x1 dots and one native depthwise conv."""
    def act(v):
        return jax.nn.leaky_relu(v) if leaky else jax.nn.relu(v)

    ca = x2.shape[-1]
    y1 = act(jnp.einsum('bhwi,io->bhwo', x2, w.w1) + w.b1)
    pad = (k - 1) // 2 * dilation
    z = lax.conv_general_dilated(
        y1, w.wdw[:, :, None, :],
        window_strides=(1, 1), padding=[(pad, pad), (pad, pad)],
        rhs_dilation=(dilation, dilation),
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
        feature_group_count=ca) + w.bdw
    outa = act(jnp.einsum('bhwi,io->bhwo', z, w.w3a)
               + jnp.einsum('bhwi,io->bhwo', x1, w.s1a) + w.b3a)
    outb = act(jnp.einsum('bhwi,io->bhwo', z, w.w3b)
               + jnp.einsum('bhwi,io->bhwo', x1, w.s1b) + w.b3b)
    return outa, outb


def build_pallas_forward(base_net: ShuffleNetV2K,
                         folded: FoldedShuffleNetV2K, *,
                         dtype=jnp.bfloat16, tile_rows=16,
                         interpret=False, impl='pallas'):
    """Forward fn with non-first blocks fused (impl='pallas') or in the
    lane-aligned halves formulation on plain XLA (impl='halves').

    Stem / first-in-stage blocks (strided, two branches) stay on XLA
    convs; each stage's run of non-first blocks chains through one
    halo-padded array with a single pad copy at entry (shuffle_pallas
    module docstring).
    """
    from . import shuffle_pallas as sp

    k = base_net.kernel
    leaky = base_net.non_linearity == 'leaky_relu'
    folded = folded.cast(dtype)

    def prep(block):
        return sp.block_weights_from_folded(block).cast(dtype)

    # group consecutive non-first blocks into fused runs
    ops = list(folded.blocks) + list(folded.conv5)
    dilations = []
    dil = [1, 1, base_net.stage4_dilation]
    for repeats, d in zip(base_net.stages_repeats, dil):
        dilations += [d] * repeats
    dilations += [base_net.stage4_dilation] * len(folded.conv5)

    segments = []  # ('xla', op) | ('fused', [(weights, dilation)...])
    for op, d in zip(ops, dilations):
        fusable = (isinstance(op, FoldedBlock) and not op.first_in_stage
                   and all(c.stride == 1 for c in op.convs))
        if fusable:
            if segments and segments[-1][0] == 'fused' \
                    and segments[-1][2] == d:
                segments[-1][1].append(prep(op))
            else:
                segments.append(('fused', [prep(op)], d))
        else:
            segments.append(('xla', op, None))

    stem = folded.stem

    def forward(x):
        x = x.astype(dtype)
        for conv in stem:
            x = conv(x)
        for kind, payload, d in segments:
            if kind == 'xla':
                x = payload(x)
                continue
            halo = (k - 1) // 2 * d
            cb = x.shape[-1] // 2
            height, width = x.shape[1], x.shape[2]
            if impl == 'halves':
                ca = payload[0].w1.shape[0]
                cpad = ((0, 0), (0, 0), (0, 0), (0, ca - cb))
                x1h = jnp.pad(x[..., :cb], cpad)
                x2h = jnp.pad(x[..., cb:], cpad)
                for weights in payload:
                    x1h, x2h = _halves_block(x1h, x2h, weights, k=k,
                                             dilation=d, leaky=leaky)
                x = jnp.concatenate([x1h[..., :cb], x2h[..., :cb]],
                                    axis=-1)
                continue
            x1p = sp.pad_half(x[..., :cb], halo)
            x2p = sp.pad_half(x[..., cb:], halo)
            for weights in payload:
                x1p, x2p = sp.fused_block(
                    x1p, x2p, weights, height=height, width=width, k=k,
                    dilation=d, tile_rows=tile_rows, leaky=leaky,
                    interpret=interpret)
            x = jnp.concatenate(
                [sp.unpad_half(x1p, halo, height, width, cb),
                 sp.unpad_half(x2p, halo, height, width, cb)], axis=-1)
        return x

    return forward


def build_fused_backbone(model, variables, dtype=jnp.bfloat16):
    """Folded forward fn for ``model.base_net`` or None if unsupported.

    Returns ``fn(images_nhwc) -> features`` with weights pre-cast to
    ``dtype``; the caller is responsible for casting inputs/outputs.
    """
    base_net = getattr(model, 'base_net', None)
    params = variables.get('params', {}).get('base_net')
    stats = variables.get('batch_stats', {}).get('base_net')
    if base_net is None or params is None or stats is None:
        return None
    try:
        folded = fold_shufflenet(base_net, params, stats)
    except KeyError:
        return None
    if folded is None:
        return None
    return folded.cast(dtype)
