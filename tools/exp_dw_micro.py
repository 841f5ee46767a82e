"""Isolated depthwise-conv microbenchmark: lax grouped conv vs the
NHWC Pallas kernel, per k16 stage geometry. Diagnoses where the
dwpallas engine's time goes (kernel vs glue). Run alone."""

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
    from openpifpaf_tpu import compile_cache
    from openpifpaf_tpu.models import dw_pallas

    compile_cache.enable(bench._default_cache_dir())

    shapes = [  # (h, w, c) of the k16 stride-1 depthwise stages at 641px
        (121, 161, 87),
        (61, 81, 174),
        (31, 41, 348),
    ]
    rng = np.random.RandomState(0)
    out = {}
    for h, w, c in shapes:
        x = jnp.asarray(rng.randn(1, h, w, c).astype(np.float32))
        kernel = jnp.asarray(0.1 * rng.randn(5, 5, 1, c).astype(np.float32))
        bias = jnp.asarray(0.01 * rng.randn(c).astype(np.float32))

        def lax_dw(xx):
            y = jax.lax.conv_general_dilated(
                xx, kernel, window_strides=(1, 1),
                padding=[(2, 2), (2, 2)],
                dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
                feature_group_count=c)
            return jax.nn.relu(y + bias)

        t_lax = bench.time_op(
            lambda s: bench._tree_scalar(lax_dw(x + s * 1e-12)), repeats=2)
        t_pal = bench.time_op(
            lambda s: bench._tree_scalar(dw_pallas.depthwise_conv(
                x + s * 1e-12, kernel, bias)), repeats=2)
        mb = h * w * c * 4 * 2 / 1e6
        out[f'{h}x{w}x{c}'] = {
            'lax_us': round(t_lax * 1e6, 1),
            'pallas_us': round(t_pal * 1e6, 1),
            'min_hbm_us_at_800GBs': round(mb / 800 * 1e3, 1),
        }
        print(json.dumps({f'{h}x{w}x{c}': out[f'{h}x{w}x{c}']}), flush=True)
    print(json.dumps(out))


if __name__ == '__main__':
    main()
