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


class ConvNormAct(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1
    groups: int = 1
    dilation: int = 1
    act: bool = True

    @nn.compact
    def __call__(self, x, *, train: bool):
        pad = (self.kernel - 1) // 2 * self.dilation
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride),
                    padding=[(pad, pad), (pad, pad)],
                    feature_group_count=self.groups,
                    kernel_dilation=(self.dilation, self.dilation),
                    use_bias=False)(x)
        x = nn.BatchNorm(use_running_average=not train,
                         momentum=BN_MOMENTUM, epsilon=BN_EPS)(x)
        if self.act:
            x = nn.relu(x)
        return x


def channel_shuffle(x, groups: int = 2):
    """NHWC equivalent of torchvision's channel_shuffle."""
    b, h, w, c = x.shape
    x = x.reshape(b, h, w, groups, c // groups)
    x = jnp.swapaxes(x, 3, 4)
    return x.reshape(b, h, w, c)


class InvertedResidualK(nn.Module):
    """ShuffleNetV2 inverted residual with configurable kernel size.

    Mirrors ``basenetworks.py:186-242``.
    """
    out_features: int
    first_in_stage: bool
    stride: int = 1
    dilation: int = 1
    kernel: int = 5

    @nn.compact
    def __call__(self, x, *, train: bool):
        branch_features = self.out_features // 2

        def branch2(inp):
            y = ConvNormAct(branch_features, kernel=1)(inp, train=train)
            y = ConvNormAct(branch_features, kernel=self.kernel,
                            stride=self.stride, dilation=self.dilation,
                            groups=branch_features, act=False)(y, train=train)
            y = ConvNormAct(branch_features, kernel=1)(y, train=train)
            return y

        if not self.first_in_stage:
            x1, x2 = jnp.split(x, 2, axis=-1)
            out = jnp.concatenate([x1, branch2(x2)], axis=-1)
        else:
            in_features = x.shape[-1]
            b1 = ConvNormAct(in_features, kernel=self.kernel,
                             stride=self.stride, dilation=self.dilation,
                             groups=in_features, act=False)(x, train=train)
            b1 = ConvNormAct(branch_features, kernel=1)(b1, train=train)
            out = jnp.concatenate([b1, branch2(x)], axis=-1)

        return channel_shuffle(out, 2)


class ShuffleNetV2K(nn.Module):
    """ShuffleNetV2 with k=5 kernels in stages, stride 16, 1x1 conv5."""
    stages_repeats: Sequence[int]
    stages_out_channels: Sequence[int]
    kernel: int = 5
    stage4_dilation: int = 1
    input_conv2_stride: int = 0
    input_conv2_outchannels: Optional[int] = None

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
        x = ConvNormAct(self.stages_out_channels[0], kernel=3, stride=2)(
            x, train=train)
        if self.input_conv2_stride:
            out_ch = self.input_conv2_outchannels or x.shape[-1]
            x = ConvNormAct(out_ch, kernel=3,
                            stride=self.input_conv2_stride)(x, train=train)

        dilations = [1, 1, self.stage4_dilation]
        for repeats, out_ch, dilation in zip(
                self.stages_repeats, self.stages_out_channels[1:4], dilations):
            stage_stride = 2 if dilation == 1 else 1
            x = InvertedResidualK(out_ch, True, stride=stage_stride,
                                  dilation=dilation, kernel=self.kernel)(
                                      x, train=train)
            for _ in range(repeats - 1):
                x = InvertedResidualK(out_ch, False, dilation=dilation,
                                      kernel=self.kernel)(x, train=train)

        x = ConvNormAct(self.stages_out_channels[-1], kernel=1)(x, train=train)
        return x


class Bottleneck(nn.Module):
    """ResNet v1 bottleneck block (torchvision layout)."""
    features: int  # output features (4x the inner width)
    stride: int = 1
    dilation: int = 1
    project: bool = False

    @nn.compact
    def __call__(self, x, *, train: bool):
        width = self.features // 4
        residual = x
        y = ConvNormAct(width, kernel=1)(x, train=train)
        y = ConvNormAct(width, kernel=3, stride=self.stride,
                        dilation=self.dilation)(y, train=train)
        y = ConvNormAct(self.features, kernel=1, act=False)(y, train=train)
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
    pool0_stride: int = 0
    input_conv_stride: int = 2
    block5_dilation: int = 1
    remove_last_block: bool = False

    @property
    def stride(self) -> int:
        s = 32
        if not self.pool0_stride:
            s //= 2
        elif self.pool0_stride != 2:
            s = int(s * 2 / self.pool0_stride)
        if self.input_conv_stride != 2:
            s = int(s * 2 / self.input_conv_stride)
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

        n_blocks = 3 if self.remove_last_block else 4
        for block_i in range(n_blocks):
            features = self.base_features * (2 ** block_i)
            is_last = block_i == 3
            dilation = self.block5_dilation if is_last else 1
            stride = 1 if block_i == 0 or (is_last and dilation != 1) else 2
            x = Bottleneck(features, stride=stride, dilation=dilation,
                           project=True)(x, train=train)
            for _ in range(self.layers[block_i] - 1):
                x = Bottleneck(features, dilation=dilation)(x, train=train)
        return x
