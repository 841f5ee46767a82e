"""Perf lab: time and profile candidate k16 backbone formulations.

Usage:
  python tools/perf_lab.py time [names...]   # slope-time formulations
  python tools/perf_lab.py profile <name>    # jax.profiler trace + summary

Formulation names: flax, folded, folded_bf16, dwstencil, dwstencil_bf16,
halves, halves_bf16, pallas_dw, pallas_dw_bf16 ...
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np  # noqa: E402


def build(name):
    import jax
    import jax.numpy as jnp
    import dataclasses
    import openpifpaf_tpu
    from openpifpaf_tpu.models import factory as models_factory
    from openpifpaf_tpu.models import fused_inference as fi

    datamodule = openpifpaf_tpu.datasets.factory('cocokp')
    net_factory = models_factory.Factory(base_name='shufflenetv2k16')
    model, init_fn = net_factory.from_scratch(datamodule.head_metas)
    variables = init_fn(jax.random.PRNGKey(0), (1, 97, 129, 3))
    base_net = model.base_net

    h, w = 481, 641
    rng = np.random.RandomState(0)
    image = jnp.asarray(rng.randn(1, h, w, 3).astype(np.float32))

    folded = fi.fold_shufflenet(
        base_net, variables['params']['base_net'],
        variables['batch_stats']['base_net'])

    def mixed_mode(f, dw_mode='stencil', pw_mode='conv', dense_mode='conv'):
        def rewrite(op):
            if isinstance(op, fi.FoldedConv):
                k = op.kernel.shape[0]
                if op.groups > 1:
                    mode = dw_mode
                elif k == 1:
                    mode = pw_mode
                else:
                    mode = dense_mode
                return dataclasses.replace(op, mode=mode)
            if isinstance(op, fi.FoldedBlock):
                return dataclasses.replace(
                    op, convs=[rewrite(c) for c in op.convs])
            return op
        return fi.FoldedShuffleNetV2K(
            stem=[rewrite(c) for c in f.stem],
            blocks=[rewrite(b) for b in f.blocks],
            conv5=[rewrite(c) for c in f.conv5])

    if name == 'flax':
        base_vars = {'params': variables['params']['base_net'],
                     'batch_stats': variables['batch_stats']['base_net']}
        fwd = jax.jit(lambda im: base_net.apply(base_vars, im, train=False))
    elif name == 'flax_bf16':
        base_vars = jax.tree_util.tree_map(
            lambda x: jnp.asarray(x, jnp.bfloat16),
            {'params': variables['params']['base_net'],
             'batch_stats': variables['batch_stats']['base_net']})
        fwd = jax.jit(lambda im: base_net.apply(
            base_vars, im.astype(jnp.bfloat16), train=False))
    elif name in ('folded', 'folded_bf16'):
        dt = jnp.bfloat16 if name.endswith('bf16') else jnp.float32
        eng = folded.cast(dt)
        fwd = jax.jit(lambda im: eng(im.astype(dt)))
    elif name in ('dwstencil', 'dwstencil_bf16'):
        dt = jnp.bfloat16 if name.endswith('bf16') else jnp.float32
        eng = mixed_mode(folded).cast(dt)
        fwd = jax.jit(lambda im: eng(im.astype(dt)))
    elif name in ('halves', 'halves_bf16'):
        dt = jnp.bfloat16 if name.endswith('bf16') else jnp.float32
        fwd = jax.jit(fi.build_pallas_forward(base_net, folded, dtype=dt,
                                              impl='halves'))
    elif name in ('pallas_dw', 'pallas_dw_bf16'):
        dt = jnp.bfloat16 if name.endswith('bf16') else jnp.float32
        from openpifpaf_tpu.models import dwconv_pallas as dwp
        eng = dwp.rewrite_folded(folded).cast(dt)
        fwd = jax.jit(lambda im: eng(im.astype(dt)))
    else:
        raise SystemExit(f'unknown formulation {name!r}')
    return fwd, image


def stem_segment_variants():
    """Time the stem -> stage2-entry segment (image -> (121,161,348)):
    0.43 ms of the 2.46 ms forward is layout copies around this segment.

    Variants: baseline folded convs; space-to-depth stem (3x3 s2 conv as
    2x2 s1 conv on the 12-channel phase image); s2d + channels padded to
    a full lane tile (zero weight rows, so numerics are identical).
    """
    import jax
    import jax.numpy as jnp
    import bench
    import openpifpaf_tpu
    from openpifpaf_tpu.models import factory as models_factory
    from openpifpaf_tpu.models import fused_inference as fi
    from jax import lax

    datamodule = openpifpaf_tpu.datasets.factory('cocokp')
    net_factory = models_factory.Factory(base_name='shufflenetv2k16')
    model, init_fn = net_factory.from_scratch(datamodule.head_metas)
    variables = init_fn(jax.random.PRNGKey(0), (1, 97, 129, 3))
    folded = fi.fold_shufflenet(
        model.base_net, variables['params']['base_net'],
        variables['batch_stats']['base_net'])

    h, w = 481, 641
    rng = np.random.RandomState(0)
    image = jnp.asarray(rng.randn(1, h, w, 3).astype(np.float32))

    stem = folded.stem[0]
    first = folded.blocks[0]  # first_in_stage stride-2 block
    dt = jnp.bfloat16

    def baseline(x):
        return first(stem(x.astype(dt)))

    # --- space-to-depth stem: xp padded, 12-channel phase image,
    # 2x2 VALID conv with remapped weights
    k3 = np.asarray(stem.kernel)  # (3, 3, 3, 24)
    k2 = np.zeros((2, 2, 12, k3.shape[-1]), np.float32)
    for dp in range(2):
        for a in range(2):
            di = 2 * dp + a
            if di > 2:
                continue
            for dq in range(2):
                for b in range(2):
                    dj = 2 * dq + b
                    if dj > 2:
                        continue
                    k2[dp, dq, a * 6 + b * 3:a * 6 + b * 3 + 3] = k3[di, dj]
    k2 = jnp.asarray(k2, dt)
    bias = jnp.asarray(stem.bias, dt)

    def s2d_stem(x):
        x = x.astype(dt)
        xp = jnp.pad(x, ((0, 0), (1, 2), (1, 2), (0, 0)))  # 484 x 644
        b_, hp, wp, c = xp.shape
        xs = xp.reshape(b_, hp // 2, 2, wp // 2, 2, c) \
            .transpose(0, 1, 3, 2, 4, 5).reshape(b_, hp // 2, wp // 2, 12)
        y = lax.conv_general_dilated(
            xs, k2, (1, 1), 'VALID',
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
        return jax.nn.relu(y + bias)

    def s2d(x):
        return first(s2d_stem(x))

    # --- s2d + lane-padded channels through the 24-channel section
    cpad = 128
    k2p = jnp.asarray(np.pad(np.asarray(k2, np.float32),
                             ((0, 0), (0, 0), (0, 0), (0, cpad - 24))), dt)
    bias_p = jnp.asarray(np.pad(np.asarray(stem.bias), (0, cpad - 24)), dt)
    # first block convs: [b1 dw(24), b1 1x1 24->174, b2 1x1 24->174,
    #                     b2 dw(174), b2 1x1 174->174]
    dw1, pw1, pw2, dw2, pw3 = first.convs
    dw1k = jnp.asarray(np.pad(np.asarray(dw1.kernel, np.float32),
                              ((0, 0), (0, 0), (0, 0), (0, cpad - 24))), dt)
    dw1b = jnp.asarray(np.pad(np.asarray(dw1.bias), (0, cpad - 24)), dt)
    pw1k = jnp.asarray(np.pad(np.asarray(pw1.kernel, np.float32),
                              ((0, 0), (0, 0), (0, cpad - 24), (0, 0))), dt)
    pw2k = jnp.asarray(np.pad(np.asarray(pw2.kernel, np.float32),
                              ((0, 0), (0, 0), (0, cpad - 24), (0, 0))), dt)

    def s2d_padded(x):
        x = x.astype(dt)
        xp = jnp.pad(x, ((0, 0), (1, 2), (1, 2), (0, 0)))
        b_, hp, wp, c = xp.shape
        xs = xp.reshape(b_, hp // 2, 2, wp // 2, 2, c) \
            .transpose(0, 1, 3, 2, 4, 5).reshape(b_, hp // 2, wp // 2, 12)
        y = lax.conv_general_dilated(
            xs, k2p, (1, 1), 'VALID',
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
        y = jax.nn.relu(y + bias_p)  # (241, 321, 128), last 104 zero
        # b1: dw 5x5 s2 (128) -> 1x1 128->174 (dw kernel already HWIO
        # with I=1)
        b1 = lax.conv_general_dilated(
            y, dw1k, (2, 2), [(2, 2), (2, 2)],
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
            feature_group_count=cpad) + dw1b
        b1 = lax.conv_general_dilated(
            b1, pw1k, (1, 1), 'VALID',
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
        b1 = jax.nn.relu(b1 + jnp.asarray(pw1.bias, dt))
        # b2: 1x1 128->174 -> dw 5x5 s2 -> 1x1
        b2 = lax.conv_general_dilated(
            y, pw2k, (1, 1), 'VALID',
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
        b2 = jax.nn.relu(b2 + jnp.asarray(pw2.bias, dt))
        b2 = dw2(b2)
        b2 = pw3(b2)
        from openpifpaf_tpu.models.basenetworks import channel_interleave2
        return channel_interleave2(b1, b2)

    # --- NCHW dimension numbers for the whole segment: XLA picks a
    # different layout family for feature-major convs
    def conv_nchw(x, kern, stride=1, pad=0, groups=1):
        return lax.conv_general_dilated(
            x, jnp.transpose(kern, (3, 2, 0, 1)),
            (stride, stride), [(pad, pad), (pad, pad)],
            dimension_numbers=('NCHW', 'OIHW', 'NCHW'),
            feature_group_count=groups)

    dw1_, pw1_, pw2_, dw2_, pw3_ = first.convs

    def nchw(x):
        x = jnp.transpose(x.astype(dt), (0, 3, 1, 2))
        y = jax.nn.relu(
            conv_nchw(x, jnp.asarray(stem.kernel, dt), 2, 1)
            + jnp.asarray(stem.bias, dt)[:, None, None])
        b1 = conv_nchw(y, jnp.asarray(dw1_.kernel, dt), 2, 2, groups=24) \
            + jnp.asarray(dw1_.bias, dt)[:, None, None]
        b1 = jax.nn.relu(conv_nchw(b1, jnp.asarray(pw1_.kernel, dt))
                         + jnp.asarray(pw1_.bias, dt)[:, None, None])
        b2 = jax.nn.relu(conv_nchw(y, jnp.asarray(pw2_.kernel, dt))
                         + jnp.asarray(pw2_.bias, dt)[:, None, None])
        b2 = conv_nchw(b2, jnp.asarray(dw2_.kernel, dt), 2, 2, groups=174) \
            + jnp.asarray(dw2_.bias, dt)[:, None, None]
        b2 = jax.nn.relu(conv_nchw(b2, jnp.asarray(pw3_.kernel, dt))
                         + jnp.asarray(pw3_.bias, dt)[:, None, None])
        from openpifpaf_tpu.models.basenetworks import channel_interleave2
        return channel_interleave2(jnp.transpose(b1, (0, 2, 3, 1)),
                                   jnp.transpose(b2, (0, 2, 3, 1)))

    variants = {'baseline': baseline, 'nchw': nchw, 's2d': s2d,
                's2d_padded': s2d_padded}
    outs = {}
    for name, fn in variants.items():
        jfn = jax.jit(fn)
        out = np.asarray(jax.block_until_ready(jfn(image)),
                         dtype=np.float32)
        outs[name] = out
        t = bench.time_op(lambda s, jfn=jfn: jnp.float32(
            bench._tree_scalar(jfn(image + s * 1e-12))))
        diff = np.abs(out - outs['baseline']).max() \
            if name != 'baseline' else 0.0
        print(f'stem {name:>12}: {t*1e6:8.1f} us  (max diff '
              f'{diff:.2e}, out {out.shape})', flush=True)


def time_formulation(name):
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import jax.numpy as jnp
    import bench
    fwd, image = build(name)

    def body(s):
        out = fwd(image + s * 1e-12)
        return jnp.sum(out.astype(jnp.float32)) * 1e-20

    t = bench.time_op(body)
    print(f'{name:>16}: {t*1e3:.3f} ms')
    return t


def profile_formulation(name, logdir='/tmp/perf_lab'):
    import jax
    fwd, image = build(name)
    out = fwd(image)
    jax.block_until_ready(out)
    import shutil
    shutil.rmtree(logdir, ignore_errors=True)
    with jax.profiler.trace(logdir):
        for _ in range(10):
            out = fwd(image)
        jax.block_until_ready(out)
    import trace_tools
    path = trace_tools.newest_xplane(logdir)
    planes = trace_tools.parse_xplane(path)
    evs = trace_tools.device_events(planes)
    rows, total = trace_tools.op_summary(evs, top=50)
    print(f'{name}: total device time {total:.3f} ms '
          f'({total/10:.3f} ms/forward) over {len(evs)} events')
    for key, ms, count in rows:
        print(f'{ms:9.3f} ms {count:5d}x  {key}')


if __name__ == '__main__':
    cmd = sys.argv[1] if len(sys.argv) > 1 else 'time'
    names = sys.argv[2:] or ['flax', 'folded', 'dwstencil']
    if cmd == 'time':
        for n in names:
            time_formulation(n)
    elif cmd == 'profile':
        profile_formulation(names[0])
    else:
        raise SystemExit(f'unknown cmd {cmd}')
