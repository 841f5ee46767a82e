"""Benchmark: single-image end-to-end throughput at 641px on the TPU.

Measures the flagship pipeline (shufflenetv2k16 + COCO CIF/CAF heads ->
device CifCaf decode) on a 641-long-edge input, the reference's headline
benchmark configuration (BASELINE.md: shufflenetv2k16, 40 ms total on a
GTX1080Ti = 25 img/s). Prints ONE JSON line.
"""

import json
import time

import numpy as np

BASELINE_IMG_PER_SEC = 25.0  # reference shufflenetv2k16, GTX1080Ti, 641px


def main():
    import jax
    import jax.numpy as jnp
    import openpifpaf_tpu
    from openpifpaf_tpu.models import factory as models_factory
    from openpifpaf_tpu.ops import build_cifcaf_decoder, CifCafDecoderConfig

    datamodule = openpifpaf_tpu.datasets.factory('cocokp')
    net_factory = models_factory.Factory(base_name='shufflenetv2k16')
    model, init_fn = net_factory.from_scratch(datamodule.head_metas)
    variables = init_fn(jax.random.PRNGKey(0), (1, 97, 129, 3))

    # 641 long edge, padded to multiple-of-16 + 1: 641 x 481
    h, w = 481, 641
    rng = np.random.RandomState(0)
    image = jnp.asarray(rng.randn(1, h, w, 3).astype(np.float32))

    cif_meta, caf_meta = datamodule.head_metas
    stride = cif_meta.stride
    decoder = build_cifcaf_decoder(
        stride=stride,
        skeleton=caf_meta.skeleton,
        n_keypoints=len(cif_meta.keypoints),
        config=CifCafDecoderConfig())

    @jax.jit
    def pipeline(variables, image):
        cif, caf = model.apply(variables, image, train=False)
        return decoder.__wrapped__(cif, caf) if hasattr(decoder, '__wrapped__') \
            else decoder(cif, caf)

    # warm up (compile)
    out = pipeline(variables, image)
    jax.block_until_ready(out)

    n_iters = 30
    start = time.perf_counter()
    for _ in range(n_iters):
        out = pipeline(variables, image)
    jax.block_until_ready(out)
    elapsed = time.perf_counter() - start

    img_per_sec = n_iters / elapsed
    print(json.dumps({
        'metric': 'images_per_sec_641px_e2e',
        'value': round(img_per_sec, 2),
        'unit': 'img/s',
        'vs_baseline': round(img_per_sec / BASELINE_IMG_PER_SEC, 3),
    }))


if __name__ == '__main__':
    main()
