"""Time the serving forward with the dw-Pallas engine vs baselines.

The round-5 attack on the k16 layout-conversion copies (44% of the
forward, docs/perf.md): run the 5x5 depthwise stages through the NHWC
Pallas kernel (models/dw_pallas.py) so no grouped conv — hence no
grouped-layout copy — appears in the graph. This script measures the
full Predictor forward (backbone + heads) for each engine with the
bench's slope methodology on the real device.

Usage:  python tools/exp_dwpallas.py [--bf16] [--engines a,b,c]
Run it ALONE (no concurrent TPU client processes).
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                '..'))

import numpy as np  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    import bench
    import openpifpaf_tpu
    from openpifpaf_tpu import compile_cache
    from openpifpaf_tpu.models import factory as models_factory
    from openpifpaf_tpu.predictor import Predictor

    compile_cache.enable(bench._default_cache_dir())

    engines = ('flax', 'folded', 'stencil', 'dwpallas')
    for a in sys.argv[1:]:
        if a.startswith('--engines'):
            engines = tuple(a.split('=', 1)[1].split(','))
    bf16 = '--bf16' in sys.argv

    datamodule = openpifpaf_tpu.datasets.factory('cocokp')
    net_factory = models_factory.Factory(base_name='shufflenetv2k16')
    model, _ = net_factory.from_scratch(datamodule.head_metas)
    variables = bench.cached_init('shufflenetv2k16')

    h, w = 481, 641
    rng = np.random.RandomState(0)
    image = jnp.asarray(rng.randn(1, h, w, 3).astype(np.float32))

    import time

    t_start = time.monotonic()

    def mark(stage):
        print(json.dumps({'stage': stage,
                          't_s': round(time.monotonic() - t_start, 1)}),
              flush=True)

    out = {}
    ref_fields = None
    for engine in engines:
        predictor = Predictor(model=model, variables=variables)
        predictor.backbone_engine = engine
        predictor.bf16 = bf16
        predictor.size_bucket = 0
        fwd = predictor.forward_fn
        # correctness probe vs the first engine before timing (the
        # fetch is also the compile sync)
        got = [np.asarray(f) for f in fwd(variables, image)]
        mark(f'{engine}_compiled')
        if ref_fields is None:
            ref_fields = got
            out['ref_engine'] = engine
        else:
            diffs = [float(np.max(np.abs(a - b)))
                     for a, b in zip(ref_fields, got)]
            out[f'{engine}_max_field_diff'] = max(diffs)
        t = bench.time_op(
            lambda s, f=fwd: bench._tree_scalar(f(variables,
                                                  image + s * 1e-12)),
            repeats=2)
        out[f'{engine}_nn_ms'] = round(t * 1e3, 3)
        print(json.dumps({engine: out[f'{engine}_nn_ms']}), flush=True)

    print(json.dumps(out))


if __name__ == '__main__':
    main()
