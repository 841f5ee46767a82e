"""Plugin registration and wholebody stress test (133 keypoints)."""

import numpy as np

import openpifpaf_tpu


def test_all_datamodules_registered():
    expected = {'cocokp', 'cocodet', 'cocokpst', 'posetrack2018',
                'wholebody', 'crowdpose', 'animal', 'apollo',
                'cifar10', 'nuscenes'}
    assert expected.issubset(set(openpifpaf_tpu.DATAMODULES))


def test_headmeta_field_counts():
    cases = {
        'wholebody': [133, 160],
        'crowdpose': [14, 15],
        'animal': [20, 20],
        'apollo': [24, 49],
        'cifar10': [10],
        'nuscenes': [23],
    }
    for name, n_fields in cases.items():
        dm = openpifpaf_tpu.datasets.factory(name)
        assert [m.n_fields for m in dm.head_metas] == n_fields, name


def test_wholebody_decoder_builds():
    """133 keypoints / 160 edges: decode pipeline must build and run."""
    from openpifpaf_tpu.ops import build_cifcaf_decoder, CifCafDecoderConfig

    dm = openpifpaf_tpu.datasets.factory('wholebody')
    cif_meta, caf_meta = dm.head_metas

    config = CifCafDecoderConfig(n_seeds=64, n_poses=8, n_hr_cells=64)
    decode = build_cifcaf_decoder(
        stride=16, skeleton=caf_meta.skeleton,
        n_keypoints=len(cif_meta.keypoints), config=config)

    rng = np.random.RandomState(0)
    cif = rng.rand(1, 133, 5, 9, 9).astype(np.float32) * 0.1
    caf = rng.rand(1, 160, 8, 9, 9).astype(np.float32) * 0.1
    poses, keep, order = decode(cif, caf)
    assert poses.shape == (1, 8, 133, 4)


def test_cifar10_basenet():
    import jax
    import jax.numpy as jnp
    from openpifpaf_tpu.models import factory as models_factory

    dm = openpifpaf_tpu.datasets.factory('cifar10')
    net_factory = models_factory.Factory(base_name='cifar10net')
    model, init_fn = net_factory.from_scratch(dm.head_metas)
    variables = init_fn(jax.random.PRNGKey(0), (1, 33, 33, 3))
    out = model.apply(variables, jnp.zeros((1, 33, 33, 3)), train=False)
    # CifDet components: [logb, conf, x, y, w, h]
    assert out[0].shape == (1, 10, 6, 3, 3)
