"""Flax base networks.

TPU-native re-implementations of the reference backbones
(``network/basenetworks.py``): NHWC layout, BatchNorm with the reference's
model defaults (eps=1e-3, momentum=0.01 torch-convention -> 0.99 flax decay,
``network/nets.py:60-89``), ReLU.

``ShuffleNetV2K`` follows ``basenetworks.py:245-404``: a ShuffleNetV2 with
kernel size 5 in stages 2-4, no max-pool (stride 16 total), and a 1x1 conv5.
``Resnet`` follows ``basenetworks.py:71-183`` with the reference's default
stride surgery (input max-pool removed -> stride 16).
"""

from typing import Callable, Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

BN_EPS = 1e-3
BN_MOMENTUM = 0.99  # flax "keep" rate == 1 - torch momentum (0.01)


def _group_norm_groups(features: int) -> int:
    """Reference's GroupNorm group count rule (basenetworks.py:398-400)."""
    return (32 if features % 32 == 0 else 29) if features > 100 else 4


class ConvNormAct(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1
    groups: int = 1
    dilation: int = 1
    act: bool = True
    norm: str = 'batch'  # 'batch' | 'group' | 'instance'
    non_linearity: str = 'relu'  # 'relu' | 'leaky_relu'

    @nn.compact
    def __call__(self, x, *, train: bool):
        pad = (self.kernel - 1) // 2 * self.dilation
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride),
                    padding=[(pad, pad), (pad, pad)],
                    feature_group_count=self.groups,
                    kernel_dilation=(self.dilation, self.dilation),
                    use_bias=False)(x)
        if self.norm == 'batch':
            x = nn.BatchNorm(use_running_average=not train,
                             momentum=BN_MOMENTUM, epsilon=BN_EPS)(x)
        elif self.norm == 'group':
            x = nn.GroupNorm(num_groups=_group_norm_groups(self.features))(x)
        elif self.norm == 'instance':
            x = nn.GroupNorm(num_groups=None, group_size=1)(x)
        else:
            raise ValueError(f'unknown norm {self.norm!r}')
        if self.act:
            x = (nn.leaky_relu(x) if self.non_linearity == 'leaky_relu'
                 else nn.relu(x))
        return x


def channel_shuffle(x, groups: int = 2):
    """NHWC equivalent of torchvision's channel_shuffle."""
    b, h, w, c = x.shape
    x = x.reshape(b, h, w, groups, c // groups)
    x = jnp.swapaxes(x, 3, 4)
    return x.reshape(b, h, w, c)


def channel_interleave2(a, b):
    """``channel_shuffle(concatenate([a, b], -1), 2)`` as one interleave.

    shuffled[2i] = a[i] and shuffled[2i+1] = b[i], which is exactly a
    stack on a trailing axis followed by a reshape — one materialization
    instead of a concat plus a transposed copy. On the bandwidth-bound
    TPU backbone this saves ~20% end-to-end (3.1 -> 2.5 ms at 641px);
    numerics are bit-identical.
    """
    bb, h, w, m = a.shape
    return jnp.stack([a, b], axis=-1).reshape(bb, h, w, 2 * m)


class InvertedResidualK(nn.Module):
    """ShuffleNetV2 inverted residual with configurable kernel size.

    Mirrors ``basenetworks.py:186-242``.
    """
    out_features: int
    first_in_stage: bool
    stride: int = 1
    dilation: int = 1
    kernel: int = 5
    norm: str = 'batch'
    non_linearity: str = 'relu'

    @nn.compact
    def __call__(self, x, *, train: bool):
        branch_features = self.out_features // 2
        style = dict(norm=self.norm, non_linearity=self.non_linearity)

        def branch2(inp):
            y = ConvNormAct(branch_features, kernel=1, **style)(
                inp, train=train)
            y = ConvNormAct(branch_features, kernel=self.kernel,
                            stride=self.stride, dilation=self.dilation,
                            groups=branch_features, act=False, **style)(
                                y, train=train)
            y = ConvNormAct(branch_features, kernel=1, **style)(y, train=train)
            return y

        if not self.first_in_stage:
            x1, x2 = jnp.split(x, 2, axis=-1)
            return channel_interleave2(x1, branch2(x2))
        in_features = x.shape[-1]
        b1 = ConvNormAct(in_features, kernel=self.kernel,
                         stride=self.stride, dilation=self.dilation,
                         groups=in_features, act=False, **style)(
                             x, train=train)
        b1 = ConvNormAct(branch_features, kernel=1, **style)(
            b1, train=train)
        return channel_interleave2(b1, branch2(x))


class ShuffleNetV2K(nn.Module):
    """ShuffleNetV2 with k=5 kernels in stages, stride 16, 1x1 conv5."""
    stages_repeats: Sequence[int]
    stages_out_channels: Sequence[int]
    kernel: int = 5
    stage4_dilation: int = 1
    input_conv2_stride: int = 0
    input_conv2_outchannels: Optional[int] = None
    conv5_as_stage: bool = False  # two blocks in place of the 1x1 conv5
    norm: str = 'batch'
    non_linearity: str = 'relu'

    @property
    def stride(self) -> int:
        s = 16
        if self.input_conv2_stride:
            s *= 2
        if self.stage4_dilation != 1:
            s //= 2
        return s

    @property
    def out_features(self) -> int:
        return self.stages_out_channels[-1]

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        style = dict(norm=self.norm, non_linearity=self.non_linearity)
        x = ConvNormAct(self.stages_out_channels[0], kernel=3, stride=2,
                        **style)(x, train=train)
        if self.input_conv2_stride:
            out_ch = self.input_conv2_outchannels or x.shape[-1]
            x = ConvNormAct(out_ch, kernel=3,
                            stride=self.input_conv2_stride, **style)(
                                x, train=train)

        dilations = [1, 1, self.stage4_dilation]
        for repeats, out_ch, dilation in zip(
                self.stages_repeats, self.stages_out_channels[1:4], dilations):
            stage_stride = 2 if dilation == 1 else 1
            x = InvertedResidualK(out_ch, True, stride=stage_stride,
                                  dilation=dilation, kernel=self.kernel,
                                  **style)(x, train=train)
            for _ in range(repeats - 1):
                x = InvertedResidualK(out_ch, False, dilation=dilation,
                                      kernel=self.kernel, **style)(
                                          x, train=train)

        out_ch = self.stages_out_channels[-1]
        if self.conv5_as_stage:
            # two stages cost about the same parameters as the 1x1 conv
            # (reference basenetworks.py:317-334)
            first = x.shape[-1] != out_ch
            x = InvertedResidualK(out_ch, first,
                                  dilation=self.stage4_dilation,
                                  kernel=self.kernel, **style)(x, train=train)
            x = InvertedResidualK(out_ch, False,
                                  dilation=self.stage4_dilation,
                                  kernel=self.kernel, **style)(x, train=train)
        else:
            x = ConvNormAct(out_ch, kernel=1, **style)(x, train=train)
        return x


class Bottleneck(nn.Module):
    """ResNet v1 bottleneck block (torchvision layout).

    ``groups``/``width_per_group`` follow torchvision's ResNeXt
    parameterization: inner width = features/4 * width_per_group/64 * groups.
    """
    features: int  # output features (4x the inner width)
    stride: int = 1
    dilation: int = 1
    project: bool = False
    groups: int = 1
    width_per_group: int = 64

    @nn.compact
    def __call__(self, x, *, train: bool):
        width = (self.features // 4) * self.width_per_group // 64 * self.groups
        residual = x
        y = ConvNormAct(width, kernel=1)(x, train=train)
        y = ConvNormAct(width, kernel=3, stride=self.stride,
                        dilation=self.dilation,
                        groups=self.groups)(y, train=train)
        y = ConvNormAct(self.features, kernel=1, act=False)(y, train=train)
        if self.project:
            residual = ConvNormAct(self.features, kernel=1,
                                   stride=self.stride, act=False)(x, train=train)
        return nn.relu(residual + y)


class BasicBlock(nn.Module):
    """ResNet v1 basic block (two 3x3 convs, torchvision layout) —
    used by resnet18 (network/factory.py:57)."""
    features: int
    stride: int = 1
    dilation: int = 1
    project: bool = False

    @nn.compact
    def __call__(self, x, *, train: bool):
        residual = x
        y = ConvNormAct(self.features, kernel=3, stride=self.stride,
                        dilation=self.dilation)(x, train=train)
        y = ConvNormAct(self.features, kernel=3, dilation=self.dilation,
                        act=False)(y, train=train)
        if self.project:
            residual = ConvNormAct(self.features, kernel=1,
                                   stride=self.stride, act=False)(x, train=train)
        return nn.relu(residual + y)


class Resnet(nn.Module):
    """ResNet with the reference's pose-estimation stride surgery:

    by default the input max pool is removed (``pool0_stride = 0``,
    ``basenetworks.py:72-94``) so the total stride is 16.
    """
    layers: Sequence[int] = (3, 4, 6, 3)
    base_features: int = 256
    basic_block: bool = False  # True for resnet18/34 (BasicBlock, 512 out)
    pool0_stride: int = 0
    input_conv_stride: int = 2
    input_conv2_stride: int = 0  # optional conv replacing the max pool
    block5_dilation: int = 1
    remove_last_block: bool = False
    groups: int = 1  # >1 turns this into ResNeXt (network/factory.py:61-62)
    width_per_group: int = 64

    @property
    def stride(self) -> int:
        s = 32
        if not self.pool0_stride:
            s //= 2
        elif self.pool0_stride != 2:
            s = int(s * 2 / self.pool0_stride)
        if self.input_conv_stride != 2:
            s = int(s * 2 / self.input_conv_stride)
        if self.input_conv2_stride:
            s *= 2
        if self.remove_last_block:
            s //= 2
        if self.block5_dilation != 1:
            s //= 2
        return s

    @property
    def out_features(self) -> int:
        n_blocks = 3 if self.remove_last_block else 4
        return self.base_features * (2 ** (n_blocks - 1))

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        x = nn.Conv(64, (7, 7), strides=(self.input_conv_stride,) * 2,
                    padding=[(3, 3), (3, 3)], use_bias=False)(x)
        x = nn.BatchNorm(use_running_average=not train,
                         momentum=BN_MOMENTUM, epsilon=BN_EPS)(x)
        x = nn.relu(x)
        if self.pool0_stride:
            x = nn.max_pool(x, (3, 3),
                            strides=(self.pool0_stride,) * 2,
                            padding=[(1, 1), (1, 1)])
        if self.input_conv2_stride:
            x = ConvNormAct(x.shape[-1], kernel=3,
                            stride=self.input_conv2_stride)(x, train=train)

        n_blocks = 3 if self.remove_last_block else 4
        for block_i in range(n_blocks):
            features = self.base_features * (2 ** block_i)
            is_last = block_i == 3
            dilation = self.block5_dilation if is_last else 1
            stride = 1 if block_i == 0 or (is_last and dilation != 1) else 2
            if self.basic_block:
                # torchvision BasicBlock stage 0 has no projection
                x = BasicBlock(features, stride=stride, dilation=dilation,
                               project=block_i > 0)(x, train=train)
                for _ in range(self.layers[block_i] - 1):
                    x = BasicBlock(features, dilation=dilation)(x, train=train)
                continue
            x = Bottleneck(features, stride=stride, dilation=dilation,
                           project=True, groups=self.groups,
                           width_per_group=self.width_per_group)(x, train=train)
            for _ in range(self.layers[block_i] - 1):
                x = Bottleneck(features, dilation=dilation, groups=self.groups,
                               width_per_group=self.width_per_group)(
                                   x, train=train)
        return x


class InvertedResidualV2(nn.Module):
    """MobileNetV2 inverted residual (expand -> depthwise -> project)."""
    features: int
    stride: int = 1
    expand_ratio: int = 6

    @nn.compact
    def __call__(self, x, *, train: bool):
        in_features = x.shape[-1]
        hidden = in_features * self.expand_ratio
        residual = x

        y = x
        if self.expand_ratio != 1:
            y = ConvNormAct(hidden, kernel=1, act=False)(y, train=train)
            y = nn.relu6(y)
        y = ConvNormAct(hidden, kernel=3, stride=self.stride,
                        groups=hidden, act=False)(y, train=train)
        y = nn.relu6(y)
        y = ConvNormAct(self.features, kernel=1, act=False)(y, train=train)

        if self.stride == 1 and in_features == self.features:
            return residual + y
        return y


class MobileNetV2(nn.Module):
    """MobileNetV2 backbone, stride 32, out 1280
    (reference ``basenetworks.py:407-429``)."""

    stride = 32
    out_features = 1280

    # (expand_ratio, features, repeats, stride)
    config = (
        (1, 16, 1, 1),
        (6, 24, 2, 2),
        (6, 32, 3, 2),
        (6, 64, 4, 2),
        (6, 96, 3, 1),
        (6, 160, 3, 2),
        (6, 320, 1, 1),
    )

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        x = ConvNormAct(32, kernel=3, stride=2, act=False)(x, train=train)
        x = nn.relu6(x)
        for expand, features, repeats, stride in self.config:
            for i in range(repeats):
                x = InvertedResidualV2(
                    features, stride=stride if i == 0 else 1,
                    expand_ratio=expand)(x, train=train)
        x = ConvNormAct(1280, kernel=1, act=False)(x, train=train)
        return nn.relu6(x)


def hard_swish(x):
    return x * nn.relu6(x + 3.0) / 6.0


def make_divisible(v: int, divisor: int = 8) -> int:
    """torchvision's channel rounding (_make_divisible)."""
    new_v = max(divisor, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


class SqueezeExcite(nn.Module):
    reduce_features: int

    @nn.compact
    def __call__(self, x):
        s = jnp.mean(x, axis=(1, 2), keepdims=True)
        s = nn.Conv(self.reduce_features, (1, 1))(s)
        s = nn.relu(s)
        s = nn.Conv(x.shape[-1], (1, 1))(s)
        s = nn.relu6(s + 3.0) / 6.0  # hard sigmoid
        return x * s


class InvertedResidualV3(nn.Module):
    """MobileNetV3 block with optional squeeze-excitation."""
    features: int
    hidden: int
    kernel: int = 3
    stride: int = 1
    use_se: bool = False
    use_hs: bool = False

    @nn.compact
    def __call__(self, x, *, train: bool):
        in_features = x.shape[-1]
        act = hard_swish if self.use_hs else nn.relu
        residual = x

        y = x
        if self.hidden != in_features:
            y = ConvNormAct(self.hidden, kernel=1, act=False)(y, train=train)
            y = act(y)
        y = ConvNormAct(self.hidden, kernel=self.kernel, stride=self.stride,
                        groups=self.hidden, act=False)(y, train=train)
        y = act(y)
        if self.use_se:
            # torchvision rounds the reduction to a multiple of 8
            y = SqueezeExcite(make_divisible(self.hidden // 4, 8))(y)
        y = ConvNormAct(self.features, kernel=1, act=False)(y, train=train)

        if self.stride == 1 and in_features == self.features:
            return residual + y
        return y


class MobileNetV3(nn.Module):
    """MobileNetV3 backbone with the reference's stride surgery: the input
    conv stride is removed so the total stride is 16
    (``basenetworks.py:432-458``)."""

    variant: str = 'large'

    # (kernel, hidden, features, use_se, use_hs, stride)
    config_large = (
        (3, 16, 16, False, False, 1),
        (3, 64, 24, False, False, 2),
        (3, 72, 24, False, False, 1),
        (5, 72, 40, True, False, 2),
        (5, 120, 40, True, False, 1),
        (5, 120, 40, True, False, 1),
        (3, 240, 80, False, True, 2),
        (3, 200, 80, False, True, 1),
        (3, 184, 80, False, True, 1),
        (3, 184, 80, False, True, 1),
        (3, 480, 112, True, True, 1),
        (3, 672, 112, True, True, 1),
        (5, 672, 160, True, True, 2),
        (5, 960, 160, True, True, 1),
        (5, 960, 160, True, True, 1),
    )
    config_small = (
        (3, 16, 16, True, False, 2),
        (3, 72, 24, False, False, 2),
        (3, 88, 24, False, False, 1),
        (5, 96, 40, True, True, 2),
        (5, 240, 40, True, True, 1),
        (5, 240, 40, True, True, 1),
        (5, 120, 48, True, True, 1),
        (5, 144, 48, True, True, 1),
        (5, 288, 96, True, True, 2),
        (5, 576, 96, True, True, 1),
        (5, 576, 96, True, True, 1),
    )

    @property
    def stride(self) -> int:
        return 16

    @property
    def out_features(self) -> int:
        return 960 if self.variant == 'large' else 576

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        # reference removes the stride of the input conv (stride 1)
        x = ConvNormAct(16, kernel=3, stride=1, act=False)(x, train=train)
        x = hard_swish(x)
        config = (self.config_large if self.variant == 'large'
                  else self.config_small)
        for kernel, hidden, features, use_se, use_hs, stride in config:
            x = InvertedResidualV3(
                features, hidden, kernel=kernel, stride=stride,
                use_se=use_se, use_hs=use_hs)(x, train=train)
        last = 960 if self.variant == 'large' else 576
        x = ConvNormAct(last, kernel=1, act=False)(x, train=train)
        return hard_swish(x)


class Fire(nn.Module):
    squeeze_features: int
    expand_features: int

    @nn.compact
    def __call__(self, x):
        s = nn.relu(nn.Conv(self.squeeze_features, (1, 1))(x))
        e1 = nn.relu(nn.Conv(self.expand_features, (1, 1))(s))
        e3 = nn.relu(nn.Conv(self.expand_features, (3, 3),
                             padding=[(1, 1), (1, 1)])(s))
        return jnp.concatenate([e1, e3], axis=-1)


class SqueezeNet(nn.Module):
    """SqueezeNet 1.1 backbone with the reference's padding adjustments
    (``basenetworks.py:461-499``): stride 16, out 512."""

    stride = 16
    out_features = 512

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        x = nn.relu(nn.Conv(64, (3, 3), strides=(2, 2),
                            padding=[(1, 1), (1, 1)])(x))
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
        x = Fire(16, 64)(x)
        x = Fire(16, 64)(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
        x = Fire(32, 128)(x)
        x = Fire(32, 128)(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
        x = Fire(48, 192)(x)
        x = Fire(48, 192)(x)
        x = Fire(64, 256)(x)
        x = Fire(64, 256)(x)
        return x
