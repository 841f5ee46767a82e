"""Trace one training step and bucket device time by category.

Where do the train img/s go? Captures a jax.profiler trace of a few
chained train steps (batch 8, 385px crops, shufflenetv2k16 + cocokp
heads), parses the xplane, and aggregates XLA op time into
forward/backward/BN/loss/optimizer buckets. Writes the category table
used by docs/perf.md's training section.

Usage: python tools/exp_train_roofline.py [--bf16] [--logdir DIR]
"""

import argparse
import collections
import json
import os
import sys
import types

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


CATEGORY_RULES = [
    # (bucket, predicate over the lowered op name)
    ('conv', lambda n: 'convolution' in n or 'conv' in n),
    ('matmul', lambda n: 'dot' in n),
    ('reduce', lambda n: 'reduce' in n or 'all-reduce' in n),
    ('copy/layout', lambda n: 'copy' in n or 'transpose' in n
        or 'bitcast' in n or 'reshape' in n),
    ('fusion', lambda n: n.startswith('fusion')),
    ('scatter/gather', lambda n: 'scatter' in n or 'gather' in n
        or 'dynamic' in n),
]


def categorize(name):
    lowered = name.lower()
    for bucket, pred in CATEGORY_RULES:
        if pred(lowered):
            return bucket
    return 'other'


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--bf16', action='store_true')
    ap.add_argument('--logdir', default='/tmp/train_trace')
    ap.add_argument('--batch', type=int, default=8)
    ap.add_argument('--size', type=int, default=385)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import openpifpaf_tpu
    from openpifpaf_tpu import compile_cache
    from openpifpaf_tpu.models import factory as models_factory
    from openpifpaf_tpu.training import losses, optimize
    from openpifpaf_tpu.training.trainer import (TrainState,
                                                 build_train_step,
                                                 make_mesh)
    import trace_tools

    compile_cache.enable(os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        '.bench_cache'))

    datamodule = openpifpaf_tpu.datasets.factory('cocokp')
    model, init_fn = models_factory.Factory(
        base_name='shufflenetv2k16').from_scratch(datamodule.head_metas)
    variables = init_fn(jax.random.PRNGKey(0), (1, 97, 129, 3))

    opt_args = types.SimpleNamespace(
        momentum=0.95, beta2=0.999, adam_eps=1e-6, nesterov=True,
        weight_decay=0.0, adam=False, amsgrad=False,
        lr=1e-3, lr_decay=[], lr_decay_factor=0.1, lr_decay_epochs=1.0,
        lr_warm_up_start_epoch=0, lr_warm_up_epochs=1,
        lr_warm_up_factor=0.001, lr_warm_restarts=[],
        lr_warm_restart_duration=0.5)
    optimizer, schedule = optimize.factory_optimizer(opt_args)
    loss_fn = losses.Factory().factory(datamodule.head_metas)
    mesh = make_mesh()
    step = build_train_step(model, loss_fn, optimizer, schedule,
                            clip_grad_norm=1.0, bf16=args.bf16, mesh=mesh)

    params = variables['params']
    loss_params = loss_fn.init_params()
    state = TrainState(
        params=params,
        batch_stats=variables.get('batch_stats', {}),
        opt_state=optimizer.init({'model': params, 'loss': loss_params}),
        ema_params=jax.tree_util.tree_map(jnp.copy, params),
        step=jnp.zeros((), dtype=jnp.int32),
        loss_params=loss_params,
        loss_state=loss_fn.init_state(),
    )

    b, hw = args.batch, args.size
    fh = fw = (hw - 1) // 16 + 1
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.randn(b, hw, hw, 3).astype(np.float32))
    cif_t = jnp.zeros((b, 17, 5, fh, fw), jnp.float32)
    caf_t = jnp.zeros((b, 19, 9, fh, fw), jnp.float32)

    # compile + warm outside the trace
    state, loss, _ = step(state, images, (cif_t, caf_t))
    float(loss)

    n_steps = 5
    with jax.profiler.trace(args.logdir):
        for _ in range(n_steps):
            state, loss, _ = step(state, images, (cif_t, caf_t))
        float(loss)  # sync inside the trace

    xplane = trace_tools.newest_xplane(args.logdir)
    planes = trace_tools.parse_xplane(xplane)
    events = trace_tools.device_events(planes)
    buckets = collections.Counter()
    op_rows, total_s = trace_tools.op_summary(events, top=20)
    for ev in events:
        buckets[categorize(ev.name.split('.')[0].lstrip('%'))] += \
            ev.duration_ps

    total_ps = sum(buckets.values())
    table = {k: {'ms_per_step': round(v / 1e9 / n_steps, 3),
                 'share': round(v / total_ps, 3)}
             for k, v in buckets.most_common()}
    print(json.dumps({
        'mode': 'bf16' if args.bf16 else 'f32',
        'device_ms_per_step': round(total_ps / 1e9 / n_steps, 2),
        'img_per_sec_device_only': round(
            b * n_steps / (total_ps / 1e12), 1),
        'categories': table,
        'top_ops': [
            {'op': k, 'ms_per_step': round(ms / n_steps, 3), 'n': c}
            for k, ms, c in op_rows[:12]],
    }, indent=1))


if __name__ == '__main__':
    main()
