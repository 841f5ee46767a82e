"""Experiment: why does batch-32 NN forward regress vs batch-8?

Measures per-image NN forward latency across batch sizes and tests the
chunked formulation (lax.map over sub-batches of 8) as a fix. Run on the
real TPU: ``python tools/exp_batch32.py``.
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                '..'))

import jax
import jax.numpy as jnp

import openpifpaf_tpu
from openpifpaf_tpu import compile_cache
from openpifpaf_tpu.models import factory as models_factory

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                '..'))
import bench


def main():
    compile_cache.enable(os.path.join(
        os.path.dirname(os.path.abspath(__file__)), '..', '.bench_cache'))
    datamodule = openpifpaf_tpu.datasets.factory('cocokp')
    net_factory = models_factory.Factory(base_name='shufflenetv2k16')
    model, _ = net_factory.from_scratch(datamodule.head_metas)
    variables = bench.cached_init('shufflenetv2k16')
    h, w = 481, 641
    rng = np.random.RandomState(0)

    def nn_time(batch, fn=None, n_lo=2, n_hi=6):
        images = jnp.asarray(rng.randn(batch, h, w, 3).astype(np.float32))
        run = fn or (lambda v, im: model.apply(v, im, train=False))
        t = bench.time_op(
            lambda s: bench._tree_scalar(run(variables, images + s * 1e-12)),
            n_lo=n_lo, n_hi=n_hi)
        return t

    for batch in (8, 32):
        t = nn_time(batch)
        print(json.dumps({'batch': batch, 'nn_ms': round(t * 1e3, 3),
                          'nn_ms_per_img': round(t / batch * 1e3, 3)}),
              flush=True)

    # chunked: lax.map over sub-batches of 8; unroll variants interleave
    # sub-batch i+1's first HBM reads behind sub-batch i's tail
    def chunked(v, im, chunk=8, unroll=1):
        n = im.shape[0] // chunk
        im = im.reshape(n, chunk, *im.shape[1:])
        if unroll == 1:
            return jax.lax.map(lambda x: model.apply(v, x, train=False), im)
        _, ys = jax.lax.scan(
            lambda c, x: (c, model.apply(v, x, train=False)),
            None, im, unroll=unroll)
        return ys

    for batch, chunk, unroll in ((32, 8, 1), (32, 8, 2), (32, 8, 4),
                                 (32, 16, 1), (16, 8, 1)):
        t = nn_time(batch,
                    fn=lambda v, im, c=chunk, u=unroll: chunked(v, im, c, u))
        print(json.dumps({'batch': batch, 'chunk': chunk, 'unroll': unroll,
                          'nn_ms': round(t * 1e3, 3),
                          'nn_ms_per_img': round(t / batch * 1e3, 3)}),
              flush=True)

    if '--trace' in sys.argv:
        # bucketed device-op table of the chunked-32 graph: where the
        # residual vs batch-8 lives (docs/perf.md batch-32 section)
        import collections
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        import trace_tools

        logdir = '/tmp/b32_trace'
        images = jnp.asarray(rng.randn(32, h, w, 3).astype(np.float32))
        fn = jax.jit(lambda v, im: chunked(v, im, 8, 1))
        np.asarray(jax.tree_util.tree_leaves(fn(variables, images))[0])
        with jax.profiler.trace(logdir):
            for _ in range(5):
                out = fn(variables, images)
            np.asarray(jax.tree_util.tree_leaves(out)[0])
        planes = trace_tools.parse_xplane(trace_tools.newest_xplane(logdir))
        events = trace_tools.device_events(planes)
        buckets = collections.Counter()
        for ev in events:
            name = ev.name.split('.')[0].lstrip('%')
            if 'copy' in name or 'transpose' in name or 'bitcast' in name:
                b = 'copy/layout'
            elif 'conv' in name or 'dot' in name:
                b = 'conv/dot'
            elif 'fusion' in name:
                b = 'fusion'
            elif 'reduce' in name:
                b = 'reduce'
            else:
                b = 'other'
            buckets[b] += ev.duration_ps
        total = sum(buckets.values())
        print(json.dumps({'trace_buckets_us_per_run': {
            k: round(v / 1e6 / 5, 1) for k, v in buckets.items()},
            'trace_total_ms_per_run': round(total / 1e9 / 5, 3)}),
            flush=True)
        summary, _ = trace_tools.op_summary(events, top=12)
        print(json.dumps({'trace_top_ops': [
            (k, round(ms, 3), n) for k, ms, n in summary[:12]]}),
            flush=True)


if __name__ == '__main__':
    main()
