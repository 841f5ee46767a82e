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
    model, init_fn = net_factory.from_scratch(datamodule.head_metas)
    variables = init_fn(jax.random.PRNGKey(0), (1, 97, 129, 3))
    h, w = 481, 641
    rng = np.random.RandomState(0)

    def nn_time(batch, fn=None, n_lo=2, n_hi=6):
        images = jnp.asarray(rng.randn(batch, h, w, 3).astype(np.float32))
        run = fn or (lambda v, im: model.apply(v, im, train=False))
        t = bench.time_op(
            lambda s: bench._tree_scalar(run(variables, images + s * 1e-12)),
            n_lo=n_lo, n_hi=n_hi)
        return t

    for batch in (32,):
        t = nn_time(batch)
        print(json.dumps({'batch': batch, 'nn_ms': round(t * 1e3, 3),
                          'nn_ms_per_img': round(t / batch * 1e3, 3)}),
              flush=True)

    # chunked: lax.map over sub-batches of 8
    def chunked(v, im, chunk=8):
        n = im.shape[0] // chunk
        im = im.reshape(n, chunk, *im.shape[1:])
        return jax.lax.map(lambda x: model.apply(v, x, train=False), im)

    for batch, chunk in ((32, 8), (32, 16), (16, 8)):
        t = nn_time(batch, fn=lambda v, im, c=chunk: chunked(v, im, c))
        print(json.dumps({'batch': batch, 'chunk': chunk,
                          'nn_ms': round(t * 1e3, 3),
                          'nn_ms_per_img': round(t / batch * 1e3, 3)}),
              flush=True)


if __name__ == '__main__':
    main()
