"""Cost of the seed-rank dedup at fast and crowd tiers. Run alone."""

import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                '..'))

import numpy as np  # noqa: E402


def main():
    import jax.numpy as jnp

    import bench
    import openpifpaf_tpu
    from openpifpaf_tpu import compile_cache
    from openpifpaf_tpu.ops import CifCafDecoderConfig, build_cifcaf_decoder

    compile_cache.enable(bench._default_cache_dir())
    datamodule = openpifpaf_tpu.datasets.factory('cocokp')
    cif_meta, caf_meta = datamodule.head_metas
    stride = 16
    fh, fw = 31, 41

    out = {}
    for tier, n_people, size, seed in (('fast', 6, 120.0, 0),
                                       ('crowd', 40, 70.0, 2)):
        cif, caf = bench.synthetic_fields(fh, fw, stride,
                                          n_people=n_people, size=size,
                                          seed=seed)
        cif = jnp.asarray(cif[None])
        caf = jnp.asarray(caf[None])
        for dedup in (True, False):
            cfg = CifCafDecoderConfig(seed_rank_dedup=dedup)
            if tier == 'crowd':
                cfg = cfg.crowd()
            dec = build_cifcaf_decoder(
                stride=stride, skeleton=caf_meta.skeleton,
                n_keypoints=len(cif_meta.keypoints), config=cfg)
            n = int(np.sum(np.asarray(dec(cif, caf)[1])))
            t = bench.time_op(
                lambda s: bench._tree_scalar(dec(cif + s * 1e-12, caf)),
                n_lo=2, n_hi=6, repeats=2)
            key = f'{tier}_dedup_{dedup}'
            out[key] = {'ms': round(t * 1e3, 3), 'poses': n}
            print(json.dumps({key: out[key]}), flush=True)
    print(json.dumps(out))


if __name__ == '__main__':
    main()
