"""Bucketed device-op table of the fast-tier batch-1 decode graph.

Where does the 1.0 ms single-image decode go? Run alone.
"""

import collections
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                '..'))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    import bench
    import trace_tools
    import openpifpaf_tpu
    from openpifpaf_tpu import compile_cache
    from openpifpaf_tpu.ops import CifCafDecoderConfig, build_cifcaf_decoder

    compile_cache.enable(bench._default_cache_dir())
    datamodule = openpifpaf_tpu.datasets.factory('cocokp')
    cif_meta, caf_meta = datamodule.head_metas
    stride = 16
    fh, fw = 31, 41
    cif, caf = bench.synthetic_fields(fh, fw, stride)
    cif = jnp.asarray(cif[None])
    caf = jnp.asarray(caf[None])

    dec = build_cifcaf_decoder(
        stride=stride, skeleton=caf_meta.skeleton,
        n_keypoints=len(cif_meta.keypoints),
        config=CifCafDecoderConfig())
    np.asarray(dec(cif, caf)[1])  # compile + warm

    logdir = '/tmp/decode_trace'
    n = 10
    with jax.profiler.trace(logdir):
        out = None
        for _ in range(n):
            out = dec(cif, caf)
        np.asarray(out[1])
    planes = trace_tools.parse_xplane(trace_tools.newest_xplane(logdir))
    events = trace_tools.device_events(planes)
    summary, total_ms = trace_tools.op_summary(events, top=200)
    buckets = collections.Counter()
    for key, ms, _ in summary:
        if key.startswith('while'):
            b = 'grow/nms while loops'
        elif 'sort' in key or 'top-k' in key or 'topk' in key:
            b = 'sort/top-k'
        elif 'copy' in key or 'transpose' in key or 'bitcast' in key:
            b = 'copy/layout'
        elif 'fusion' in key:
            b = 'fusion (elementwise/blend)'
        elif 'dot' in key or 'conv' in key:
            b = 'dot'
        else:
            b = 'other'
        buckets[b] += ms
    print(json.dumps({'decode_trace_ms_per_run': {
        k: round(v / n, 4) for k, v in buckets.items()},
        'total_ms_per_run': round(total_ms / n, 3)}))
    top = [(k[:60], round(ms / n, 4), cnt) for k, ms, cnt in summary[:15]]
    print(json.dumps({'top_ops_per_run': top}))


if __name__ == '__main__':
    main()
