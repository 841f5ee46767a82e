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
