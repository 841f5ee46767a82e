"""PyTorch fixture models that replicate the *reference checkpoint layout*.

These mirror the module registration structure of the reference
(``network/basenetworks.py:186-345`` for ShuffleNetV2K,
``basenetworks.py:71-183`` for Resnet, ``network/nets.py:7-33`` +
``network/heads.py:272-310`` for Shell/CompositeField4) so that
``torch.save({'model': shell, ...})`` produces checkpoints with the same
dotted state names the converter must handle. Written from the structural
survey; used only as a test fixture for numeric conversion parity.
"""

import torch


def _cna(inp, out, kernel=3, stride=1, groups=1, dilation=1):
    padding = (kernel - 1) // 2 * dilation
    return torch.nn.Sequential(
        torch.nn.Conv2d(inp, out, kernel, stride, padding,
                        groups=groups, dilation=dilation, bias=False),
        torch.nn.BatchNorm2d(out),
        torch.nn.ReLU(inplace=True),
    )


def _channel_shuffle(x, groups=2):
    b, c, h, w = x.shape
    x = x.view(b, groups, c // groups, h, w).transpose(1, 2).contiguous()
    return x.view(b, c, h, w)


class InvertedResidualK(torch.nn.Module):
    def __init__(self, inp, oup, first_in_stage, *, stride=1, kernel=5):
        super().__init__()
        branch = oup // 2
        pad = (kernel - 1) // 2

        self.branch1 = None
        if first_in_stage:
            self.branch1 = torch.nn.Sequential(
                torch.nn.Conv2d(inp, inp, kernel, stride, pad,
                                groups=inp, bias=False),
                torch.nn.BatchNorm2d(inp),
                torch.nn.Conv2d(inp, branch, 1, bias=False),
                torch.nn.BatchNorm2d(branch),
                torch.nn.ReLU(inplace=True),
            )
        self.branch2 = torch.nn.Sequential(
            torch.nn.Conv2d(inp if first_in_stage else branch, branch, 1,
                            bias=False),
            torch.nn.BatchNorm2d(branch),
            torch.nn.ReLU(inplace=True),
            torch.nn.Conv2d(branch, branch, kernel, stride, pad,
                            groups=branch, bias=False),
            torch.nn.BatchNorm2d(branch),
            torch.nn.Conv2d(branch, branch, 1, bias=False),
            torch.nn.BatchNorm2d(branch),
            torch.nn.ReLU(inplace=True),
        )

    def forward(self, x):
        if self.branch1 is None:
            x1, x2 = x.chunk(2, dim=1)
            out = torch.cat((x1, self.branch2(x2)), dim=1)
        else:
            out = torch.cat((self.branch1(x), self.branch2(x)), dim=1)
        return _channel_shuffle(out)


class ShuffleNetV2K(torch.nn.Module):
    stride = 16

    def __init__(self, stages_repeats, stages_out_channels, kernel=5):
        super().__init__()
        self.out_features = stages_out_channels[-1]
        self.input_block = torch.nn.Sequential(
            _cna(3, stages_out_channels[0], 3, 2))
        inp = stages_out_channels[0]
        for stage_i, (repeats, out) in enumerate(
                zip(stages_repeats, stages_out_channels[1:4])):
            seq = [InvertedResidualK(inp, out, True, stride=2, kernel=kernel)]
            seq += [InvertedResidualK(out, out, False, kernel=kernel)
                    for _ in range(repeats - 1)]
            setattr(self, f'stage{stage_i + 2}', torch.nn.Sequential(*seq))
            inp = out
        self.conv5 = _cna(inp, stages_out_channels[-1], 1)

    def forward(self, x):
        x = self.input_block(x)
        x = self.stage2(x)
        x = self.stage3(x)
        x = self.stage4(x)
        return self.conv5(x)


class Bottleneck(torch.nn.Module):
    def __init__(self, inp, planes, stride=1, groups=1, width_per_group=64):
        super().__init__()
        width = planes * width_per_group // 64 * groups
        out = planes * 4
        self.conv1 = torch.nn.Conv2d(inp, width, 1, bias=False)
        self.bn1 = torch.nn.BatchNorm2d(width)
        self.conv2 = torch.nn.Conv2d(width, width, 3, stride, 1,
                                     groups=groups, bias=False)
        self.bn2 = torch.nn.BatchNorm2d(width)
        self.conv3 = torch.nn.Conv2d(width, out, 1, bias=False)
        self.bn3 = torch.nn.BatchNorm2d(out)
        self.relu = torch.nn.ReLU(inplace=True)
        self.downsample = None
        if stride != 1 or inp != out:
            self.downsample = torch.nn.Sequential(
                torch.nn.Conv2d(inp, out, 1, stride, bias=False),
                torch.nn.BatchNorm2d(out),
            )

    def forward(self, x):
        identity = self.downsample(x) if self.downsample is not None else x
        y = self.relu(self.bn1(self.conv1(x)))
        y = self.relu(self.bn2(self.conv2(y)))
        y = self.bn3(self.conv3(y))
        return self.relu(identity + y)


class BasicBlock(torch.nn.Module):
    def __init__(self, inp, planes, stride=1):
        super().__init__()
        self.conv1 = torch.nn.Conv2d(inp, planes, 3, stride, 1, bias=False)
        self.bn1 = torch.nn.BatchNorm2d(planes)
        self.conv2 = torch.nn.Conv2d(planes, planes, 3, 1, 1, bias=False)
        self.bn2 = torch.nn.BatchNorm2d(planes)
        self.relu = torch.nn.ReLU(inplace=True)
        self.downsample = None
        if stride != 1 or inp != planes:
            self.downsample = torch.nn.Sequential(
                torch.nn.Conv2d(inp, planes, 1, stride, bias=False),
                torch.nn.BatchNorm2d(planes),
            )

    def forward(self, x):
        identity = self.downsample(x) if self.downsample is not None else x
        y = self.relu(self.bn1(self.conv1(x)))
        y = self.bn2(self.conv2(y))
        return self.relu(identity + y)


class Resnet(torch.nn.Module):
    """Reference layout: input_block (pool removed -> stride 16) +
    block2..block5."""
    stride = 16

    def __init__(self, layers, *, basic=False, groups=1, width_per_group=64):
        super().__init__()
        self.input_block = torch.nn.Sequential(
            torch.nn.Conv2d(3, 64, 7, 2, 3, bias=False),
            torch.nn.BatchNorm2d(64),
            torch.nn.ReLU(inplace=True),
        )
        block_cls = BasicBlock if basic else Bottleneck
        inp = 64
        for block_i, repeats in enumerate(layers):
            planes = 64 * (2 ** block_i)
            stride = 1 if block_i == 0 else 2
            if basic:
                seq = [block_cls(inp, planes, stride)]
                inp = planes
            else:
                seq = [block_cls(inp, planes, stride, groups, width_per_group)]
                inp = planes * 4
            for _ in range(repeats - 1):
                seq.append(block_cls(inp, planes) if basic else
                           block_cls(inp, planes, 1, groups, width_per_group))
            setattr(self, f'block{block_i + 2}', torch.nn.Sequential(*seq))
        self.out_features = inp

    def forward(self, x):
        x = self.input_block(x)
        x = self.block2(x)
        x = self.block3(x)
        x = self.block4(x)
        return self.block5(x)


class Cif:  # noqa: mirror of reference headmeta.Cif attribute names
    def __init__(self, name, dataset, keypoints, sigmas):
        self.name = name
        self.dataset = dataset
        self.keypoints = keypoints
        self.sigmas = sigmas
        self.pose = None
        self.draw_skeleton = None
        self.score_weights = None
        self.upsample_stride = 1
        self.n_confidences, self.n_vectors, self.n_scales = 1, 1, 1

    @property
    def n_fields(self):
        return len(self.keypoints)


class Caf:
    def __init__(self, name, dataset, keypoints, sigmas, skeleton):
        self.name = name
        self.dataset = dataset
        self.keypoints = keypoints
        self.sigmas = sigmas
        self.skeleton = skeleton
        self.pose = None
        self.sparse_skeleton = None
        self.only_in_field_of_view = False
        self.upsample_stride = 1
        self.n_confidences, self.n_vectors, self.n_scales = 1, 2, 2

    @property
    def n_fields(self):
        return len(self.skeleton)


class CompositeField4(torch.nn.Module):
    def __init__(self, meta, in_features):
        super().__init__()
        self.meta = meta
        n_components = 1 + meta.n_confidences + meta.n_vectors * 2 + meta.n_scales
        self.conv = torch.nn.Conv2d(
            in_features, meta.n_fields * n_components, 1)

    def forward(self, x):  # raw (training) output layout (B, F, C, H, W)
        x = self.conv(x)
        b, _, h, w = x.shape
        return x.view(b, self.meta.n_fields, -1, h, w)


class CompositeField3(torch.nn.Module):
    """Legacy head layout (reference heads.py:116-270): per-field
    channels [conf, vectors, logb (one per vector), scales]."""

    def __init__(self, meta, in_features):
        super().__init__()
        self.meta = meta
        n_components = meta.n_confidences + meta.n_vectors * 3 + meta.n_scales
        self.conv = torch.nn.Conv2d(
            in_features, meta.n_fields * n_components, 1)

    def forward(self, x):  # raw CF3 layout (B, F, C3, H, W)
        x = self.conv(x)
        b, _, h, w = x.shape
        return x.view(b, self.meta.n_fields, -1, h, w)

    def forward_inference_v4(self, x):
        """The reference's eval-mode output (heads.py:216-262): sigmoid,
        index-add, softplus, then v4-style channel reorder."""
        x = self.forward(x)
        n_c = self.meta.n_confidences
        n_v = self.meta.n_vectors
        classes_x = torch.sigmoid(x[:, :, 0:n_c])
        h, w = x.shape[-2:]
        yv, xv = torch.meshgrid(torch.arange(h, dtype=torch.float32),
                                torch.arange(w, dtype=torch.float32),
                                indexing='ij')
        index_field = torch.stack([xv, yv])
        regs = []
        for i in range(n_v):
            regs.append(x[:, :, n_c + i * 2:n_c + (i + 1) * 2] + index_field)
        first_scale = n_c + n_v * 3
        scales_x = torch.nn.functional.softplus(x[:, :, first_scale:])
        first_width = n_c + n_v * 2
        width_x = x[:, :, first_width:first_width + 1]
        return torch.cat([width_x, classes_x] + regs + [scales_x], dim=2)


class Shell(torch.nn.Module):
    def __init__(self, base_net, head_nets):
        super().__init__()
        self.base_net = base_net
        self.head_nets = torch.nn.ModuleList(head_nets)

    def forward(self, x):
        x = self.base_net(x)
        return tuple(hn(x) for hn in self.head_nets)


def build_shell(base_name='shufflenetv2k16', head_cls=None):
    if base_name == 'shufflenetv2k16':
        base = ShuffleNetV2K([4, 8, 4], [24, 348, 696, 1392, 1392])
    elif base_name == 'resnet18':
        base = Resnet([2, 2, 2, 2], basic=True)
    elif base_name == 'resnet50':
        base = Resnet([3, 4, 6, 3])
    elif base_name == 'resnext50':
        base = Resnet([3, 4, 6, 3], groups=32, width_per_group=4)
    elif base_name == 'mobilenetv2':
        base = MobileNetV2()
    elif base_name == 'mobilenetv3large':
        base = MobileNetV3('large')
    elif base_name == 'mobilenetv3small':
        base = MobileNetV3('small')
    elif base_name == 'squeezenet':
        base = SqueezeNetTV()
    else:
        raise ValueError(base_name)

    kps = [f'kp{i}' for i in range(17)]
    sigmas = [0.05] * 17
    skeleton = [(i + 1, i + 2) for i in range(16)] + [(1, 17), (2, 16), (3, 15)]
    cif = Cif('cif', 'cocokp', kps, sigmas)
    caf = Caf('caf', 'cocokp', kps, sigmas, skeleton)
    if head_cls is None:
        head_cls = CompositeField4
    heads = [head_cls(cif, base.out_features),
             head_cls(caf, base.out_features)]
    shell = Shell(base, heads)
    # reference model_defaults (network/nets.py:60-89): BN eps=1e-3,
    # momentum=0.01 — applied to every trained reference model
    for m in shell.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.eps = 1e-3
            m.momentum = 0.01
    return shell


def randomize_batch_norm_stats(model, seed=0):
    """Give running stats non-trivial values so eval-mode parity actually
    exercises the batch_stats conversion."""
    gen = torch.Generator().manual_seed(seed)
    for m in model.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.copy_(torch.randn(m.running_mean.shape,
                                             generator=gen) * 0.1)
            m.running_var.copy_(
                1.0 + 0.3 * torch.rand(m.running_var.shape, generator=gen))


def _cba(inp, out, kernel=3, stride=1, groups=1, act='relu6'):
    """torchvision ConvBNActivation layout."""
    layers = [
        torch.nn.Conv2d(inp, out, kernel, stride, (kernel - 1) // 2,
                        groups=groups, bias=False),
        torch.nn.BatchNorm2d(out),
    ]
    if act == 'relu6':
        layers.append(torch.nn.ReLU6(inplace=True))
    elif act == 'hs':
        layers.append(torch.nn.Hardswish(inplace=True))
    elif act == 'relu':
        layers.append(torch.nn.ReLU(inplace=True))
    return torch.nn.Sequential(*layers)


class InvertedResidualV2(torch.nn.Module):
    def __init__(self, inp, out, stride, expand):
        super().__init__()
        hidden = inp * expand
        self.use_res = stride == 1 and inp == out
        layers = []
        if expand != 1:
            layers.append(_cba(inp, hidden, 1))
        layers.append(_cba(hidden, hidden, 3, stride, groups=hidden))
        layers.append(torch.nn.Conv2d(hidden, out, 1, bias=False))
        layers.append(torch.nn.BatchNorm2d(out))
        self.conv = torch.nn.Sequential(*layers)

    def forward(self, x):
        return x + self.conv(x) if self.use_res else self.conv(x)


class MobileNetV2(torch.nn.Module):
    """reference layout: torchvision features as `backbone`
    (basenetworks.py:408-418)."""
    config = ((1, 16, 1, 1), (6, 24, 2, 2), (6, 32, 3, 2), (6, 64, 4, 2),
              (6, 96, 3, 1), (6, 160, 3, 2), (6, 320, 1, 1))
    out_features = 1280

    def __init__(self):
        super().__init__()
        layers = [_cba(3, 32, 3, 2)]
        inp = 32
        for expand, out, repeats, stride in self.config:
            for i in range(repeats):
                layers.append(InvertedResidualV2(
                    inp, out, stride if i == 0 else 1, expand))
                inp = out
        layers.append(_cba(inp, 1280, 1))
        self.backbone = torch.nn.Sequential(*layers)

    def forward(self, x):
        return self.backbone(x)


class SqueezeExcitationTV(torch.nn.Module):
    def __init__(self, ch, squeeze):
        super().__init__()
        self.fc1 = torch.nn.Conv2d(ch, squeeze, 1)
        self.fc2 = torch.nn.Conv2d(squeeze, ch, 1)

    def forward(self, x):
        s = torch.nn.functional.adaptive_avg_pool2d(x, 1)
        s = torch.relu(self.fc1(s))
        s = torch.nn.functional.hardsigmoid(self.fc2(s))
        return x * s


def _make_divisible(v, divisor=8):
    new_v = max(divisor, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


class InvertedResidualV3(torch.nn.Module):
    def __init__(self, inp, hidden, out, kernel, stride, use_se, use_hs):
        super().__init__()
        act = 'hs' if use_hs else 'relu'
        self.use_res = stride == 1 and inp == out
        layers = []
        if hidden != inp:
            layers.append(_cba(inp, hidden, 1, act=act))
        layers.append(_cba(hidden, hidden, kernel, stride,
                           groups=hidden, act=act))
        if use_se:
            layers.append(SqueezeExcitationTV(
                hidden, _make_divisible(hidden // 4)))
        layers.append(_cba(hidden, out, 1, act='none'))
        self.block = torch.nn.Sequential(*layers)

    def forward(self, x):
        return x + self.block(x) if self.use_res else self.block(x)


class MobileNetV3(torch.nn.Module):
    """reference layout with stride removed from the input conv
    (basenetworks.py:432-448)."""
    config_large = (
        (3, 16, 16, False, False, 1), (3, 64, 24, False, False, 2),
        (3, 72, 24, False, False, 1), (5, 72, 40, True, False, 2),
        (5, 120, 40, True, False, 1), (5, 120, 40, True, False, 1),
        (3, 240, 80, False, True, 2), (3, 200, 80, False, True, 1),
        (3, 184, 80, False, True, 1), (3, 184, 80, False, True, 1),
        (3, 480, 112, True, True, 1), (3, 672, 112, True, True, 1),
        (5, 672, 160, True, True, 2), (5, 960, 160, True, True, 1),
        (5, 960, 160, True, True, 1),
    )
    config_small = (
        (3, 16, 16, True, False, 2), (3, 72, 24, False, False, 2),
        (3, 88, 24, False, False, 1), (5, 96, 40, True, True, 2),
        (5, 240, 40, True, True, 1), (5, 240, 40, True, True, 1),
        (5, 120, 48, True, True, 1), (5, 144, 48, True, True, 1),
        (5, 288, 96, True, True, 2), (5, 576, 96, True, True, 1),
        (5, 576, 96, True, True, 1),
    )

    def __init__(self, variant='large'):
        super().__init__()
        config = (self.config_large if variant == 'large'
                  else self.config_small)
        layers = [_cba(3, 16, 3, 1, act='hs')]  # stride surgery: 2 -> 1
        inp = 16
        for kernel, hidden, out, use_se, use_hs, stride in config:
            layers.append(InvertedResidualV3(
                inp, hidden, out, kernel, stride, use_se, use_hs))
            inp = out
        last = 960 if variant == 'large' else 576
        layers.append(_cba(inp, last, 1, act='hs'))
        self.backbone = torch.nn.Sequential(*layers)
        self.out_features = last

    def forward(self, x):
        return self.backbone(x)


class FireTV(torch.nn.Module):
    def __init__(self, inp, squeeze, expand):
        super().__init__()
        self.squeeze = torch.nn.Conv2d(inp, squeeze, 1)
        self.expand1x1 = torch.nn.Conv2d(squeeze, expand, 1)
        self.expand3x3 = torch.nn.Conv2d(squeeze, expand, 3, padding=1)

    def forward(self, x):
        s = torch.relu(self.squeeze(x))
        return torch.cat([torch.relu(self.expand1x1(s)),
                          torch.relu(self.expand3x3(s))], dim=1)


class SqueezeNetTV(torch.nn.Module):
    """torchvision squeezenet1_1 features with the reference's padding
    adjustments (basenetworks.py:461-488)."""
    out_features = 512

    def __init__(self):
        super().__init__()
        self.backbone = torch.nn.Sequential(
            torch.nn.Conv2d(3, 64, 3, 2, 1),
            torch.nn.ReLU(inplace=True),
            torch.nn.MaxPool2d(3, 2, padding=1),
            FireTV(64, 16, 64), FireTV(128, 16, 64),
            torch.nn.MaxPool2d(3, 2, padding=1),
            FireTV(128, 32, 128), FireTV(256, 32, 128),
            torch.nn.MaxPool2d(3, 2, padding=1),
            FireTV(256, 48, 192), FireTV(384, 48, 192),
            FireTV(384, 64, 256), FireTV(512, 64, 256),
        )

    def forward(self, x):
        return self.backbone(x)


class TrackingBase(torch.nn.Module):
    """reference network/tracking_base.py:6-40 layout."""

    def __init__(self, single_image_backbone):
        super().__init__()
        self.single_image_backbone = single_image_backbone
        self.stride = single_image_backbone.stride
        self.out_features = single_image_backbone.out_features

    def forward(self, x):  # training path: no feature cache
        return self.single_image_backbone(x)


class TSingleImageCifMeta(Cif):
    pass


class TSingleImageCafMeta(Caf):
    pass


class TcafMeta:
    def __init__(self, name, dataset, keypoints, sigmas):
        self.name = name
        self.dataset = dataset
        self.keypoints_single_frame = keypoints
        self.sigmas_single_frame = sigmas
        self.pose_single_frame = None
        self.draw_skeleton_single_frame = None
        self.keypoints = keypoints + keypoints
        self.sigmas = sigmas + sigmas
        self.pose = None
        self.draw_skeleton = None
        self.only_in_field_of_view = False
        self.upsample_stride = 1
        self.n_confidences, self.n_vectors, self.n_scales = 1, 2, 2

    @property
    def n_fields(self):
        return len(self.keypoints_single_frame)


# the stub unpickler resolves classes by their pickled qualname; reference
# tracking metas are named TSingleImageCif/TSingleImageCaf/Tcaf
for _cls, _ref_name in ((TSingleImageCifMeta, 'TSingleImageCif'),
                        (TSingleImageCafMeta, 'TSingleImageCaf'),
                        (TcafMeta, 'Tcaf')):
    _cls.__name__ = _ref_name
    _cls.__qualname__ = _ref_name

# pickle's save_global looks the qualname up in this module
TSingleImageCif = TSingleImageCifMeta
TSingleImageCaf = TSingleImageCafMeta
Tcaf = TcafMeta


class TBaseSingleImage(torch.nn.Module):
    """reference tracking_heads.py:6-37 layout."""

    def __init__(self, meta, in_features):
        super().__init__()
        self.meta = meta
        self.head = CompositeField4(meta, in_features)

    def forward(self, x):  # training: primary frames only
        return self.head(x[::2])


class TcafHead(torch.nn.Module):
    """reference tracking_heads.py:40-103 layout."""

    def __init__(self, meta, in_features, reduced=512):
        super().__init__()
        self.meta = meta
        self.feature_reduction = torch.nn.Sequential(
            torch.nn.Conv2d(in_features, reduced, 1, bias=True),
            torch.nn.ReLU(inplace=True))
        self.feature_compute = torch.nn.Sequential(
            torch.nn.Conv2d(reduced * 2, reduced * 2, 1, bias=True),
            torch.nn.ReLU(inplace=True))
        self.head = CompositeField4(meta, reduced * 2)

    def forward(self, x):
        x = self.feature_reduction(x)
        x = torch.cat([x[::2], x[1::2]], dim=1)
        x = self.feature_compute(x)
        return self.head(x)


def build_tracking_shell(base_name='tshufflenetv2k16'):
    base = ShuffleNetV2K([4, 8, 4], [24, 348, 696, 1392, 1392])
    tbase = TrackingBase(base)

    kps = [f'kp{i}' for i in range(17)]
    sigmas = [0.05] * 17
    skeleton = [(i + 1, i + 2) for i in range(16)] + [(1, 17), (2, 16), (3, 15)]
    cif = TSingleImageCifMeta('cif', 'cocokpst', kps, sigmas)
    caf = TSingleImageCafMeta('caf', 'cocokpst', kps, sigmas, skeleton)
    tcaf = TcafMeta('tcaf', 'cocokpst', kps, sigmas)
    heads = [TBaseSingleImage(cif, tbase.out_features),
             TBaseSingleImage(caf, tbase.out_features),
             TcafHead(tcaf, tbase.out_features)]
    shell = Shell(tbase, heads)
    for m in shell.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.eps = 1e-3
            m.momentum = 0.01
    return shell
