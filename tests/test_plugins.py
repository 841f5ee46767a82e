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


def test_checkpoint_urls_registered():
    from openpifpaf_tpu.models.factory import (CHECKPOINT_URLS,
                                               PRETRAINED_UNAVAILABLE)
    available = {k for k, v in CHECKPOINT_URLS.items()
                 if v is not PRETRAINED_UNAVAILABLE}
    for name in ('shufflenetv2k16', 'shufflenetv2k30', 'resnet50',
                 'shufflenetv2k16-wholebody', 'tshufflenetv2k30',
                 'resnet50-crowdpose'):
        assert name in available
    assert CHECKPOINT_URLS['resnet18'] is PRETRAINED_UNAVAILABLE


def test_resolve_checkpoint(tmp_path):
    import pytest
    from openpifpaf_tpu.models import factory as models_factory

    # unavailable name raises with alternatives
    with pytest.raises(ValueError, match='no pretrained weights'):
        models_factory.resolve_checkpoint('resnet18')

    # a registered local path resolves without download
    local = tmp_path / 'fake.pkl'
    local.write_bytes(b'x')
    models_factory.CHECKPOINT_URLS['_test_local'] = str(local)
    try:
        assert models_factory.resolve_checkpoint('_test_local') == str(local)
    finally:
        del models_factory.CHECKPOINT_URLS['_test_local']

    # unknown names pass through for the loader to error with context
    assert models_factory.resolve_checkpoint('/nonexistent/path') == \
        '/nonexistent/path'


def test_external_plugin_discovery(tmp_path):
    """Any installed ``openpifpaf_tpu_*`` package with a register() is
    auto-discovered (reference tests/test_plugin.py + plugin.py:17-41)."""
    import os
    import subprocess
    import sys
    import textwrap

    pkg = tmp_path / 'openpifpaf_tpu_testplugin'
    pkg.mkdir()
    (pkg / '__init__.py').write_text(textwrap.dedent('''
        import openpifpaf_tpu

        class FakeDataModule(openpifpaf_tpu.datasets.DataModule):
            pass

        def register():
            openpifpaf_tpu.DATAMODULES['testplugin'] = FakeDataModule
    '''))

    env = dict(os.environ, JAX_PLATFORMS='cpu',
               PYTHONPATH=os.getcwd() + os.pathsep + str(tmp_path))
    out = subprocess.run(
        [sys.executable, '-c',
         'import openpifpaf_tpu; '
         'print("testplugin" in openpifpaf_tpu.DATAMODULES)'],
        capture_output=True, text=True, env=env, timeout=300)
    assert out.returncode == 0, out.stderr
    assert out.stdout.strip() == 'True'


def test_apollo_mean_pixel_error():
    """MeanPixelError (reference plugins/apollocar3d/metrics.py): nearest
    prediction within 10 px counts as a detection."""
    import numpy as np
    from openpifpaf_tpu.annotation import Annotation
    from openpifpaf_tpu.plugins.apollocar3d.metrics import MeanPixelError

    kps = [f'k{i}' for i in range(5)]
    skel = [(1, 2)]

    gt = Annotation(kps, skel)
    gt.set(np.array([[10.0, 10.0, 2.0],
                     [20.0, 10.0, 2.0],
                     [30.0, 10.0, 2.0],
                     [40.0, 10.0, 2.0],
                     [0.0, 0.0, 0.0]], dtype=np.float32),
           fixed_bbox=np.array([0.0, 0.0, 368.0, 368.0]))

    pred = Annotation(kps, skel)
    pred.set(np.array([[11.0, 10.0, 0.9],   # 1 px off -> detection
                       [20.0, 10.0, 0.9],   # exact
                       [30.0, 30.0, 0.9],   # 20 px off -> miss
                       [41.0, 10.0, 0.9],
                       [0.0, 0.0, 0.0]], dtype=np.float32))

    m = MeanPixelError()
    m.accumulate([pred], {}, ground_truth=[gt])
    stats = m.stats()
    assert stats['stats'][2] == 75.0  # 3 of 4 annotated GT joints detected
    assert 0.0 < stats['stats'][0] < 10.0


def test_apollo_kp_count_flags():
    """--apollo-use-66-kps switches to the 66-keypoint configuration."""
    import argparse
    from openpifpaf_tpu.plugins.apollocar3d import ApolloKp

    saved = {k: getattr(ApolloKp, k) for k in
             ('use_24_kps', 'keypoints', 'sigmas', 'skeleton', 'upright_pose',
              'hflip', 'train_annotations', 'val_annotations',
              'eval_annotations')}
    try:
        parser = argparse.ArgumentParser()
        ApolloKp.cli(parser)
        args = parser.parse_args(['--apollo-use-66-kps'])
        ApolloKp.configure(args)
        assert len(ApolloKp.keypoints) == 66
        dm = ApolloKp()
        assert len(dm.head_metas[0].keypoints) == 66
    finally:
        for k, v in saved.items():
            setattr(ApolloKp, k, v)


def test_apollo_to_coco_converter(tmp_path):
    """apollo_to_coco on a synthetic mini-dataset produces valid COCO
    json in both keypoint configurations."""
    import json
    import numpy as np
    import PIL.Image
    from openpifpaf_tpu.plugins.apollocar3d.apollo_to_coco import (
        ApolloToCoco, KPS_MAPPING)

    root = tmp_path / 'train'
    for sub in ('images', 'keypoints', 'ignore_mask', 'split'):
        (root / sub).mkdir(parents=True)

    im_name = 'picture_0001'
    PIL.Image.new('RGB', (120, 80)).save(root / 'images' / f'{im_name}.jpg')
    # one car: three 66-kp-indexed keypoints, two of them in the 24 subset
    kp_dir = root / 'keypoints' / im_name
    kp_dir.mkdir()
    np.savetxt(kp_dir / f'{im_name}_3.txt',
               np.array([[49.0, 10.0, 20.0],
                         [8.0, 30.0, 25.0],
                         [1.0, 50.0, 30.0]]), delimiter='\t')
    # ignore mask with one white blob
    mask = np.zeros((80, 120), dtype=np.uint8)
    mask[60:75, 90:110] = 255
    PIL.Image.fromarray(mask).save(root / 'ignore_mask' / f'{im_name}.jpg')
    for split_file in ('train-list.txt', 'validation-list.txt'):
        with open(root / 'split' / split_file, 'w') as f:
            f.write(f'{im_name}.jpg\n')

    out = tmp_path / 'out'
    conv = ApolloToCoco(str(root), str(out))
    conv.process()

    with open(out / 'annotations' / 'apollo_keypoints_24_train.json') as f:
        j24 = json.load(f)
    with open(out / 'annotations' / 'apollo_keypoints_66_val.json') as f:
        j66 = json.load(f)

    assert len(j24['images']) == 1
    cars24 = [a for a in j24['annotations'] if not a['iscrowd']]
    crowds24 = [a for a in j24['annotations'] if a['iscrowd']]
    assert len(cars24) == 1 and len(crowds24) >= 1
    assert cars24[0]['num_keypoints'] == 2  # kp 1 not in the 24 subset
    kps24 = np.asarray(cars24[0]['keypoints']).reshape(-1, 3)
    assert len(kps24) == 24
    assert kps24[KPS_MAPPING.index(49)][0] == 10.0

    cars66 = [a for a in j66['annotations'] if not a['iscrowd']]
    assert cars66[0]['num_keypoints'] == 3
    assert len(np.asarray(cars66[0]['keypoints']).reshape(-1, 3)) == 66


def test_voc_to_coco_converter(tmp_path):
    """voc_to_coco on a synthetic part-2-style mini release produces
    valid COCO json."""
    import json
    import numpy as np
    import PIL.Image
    from openpifpaf_tpu.plugins.animalpose.voc_to_coco import VocToCoco

    root = tmp_path
    (root / 'TrainVal' / 'VOCdevkit' / 'VOC2011'
     / 'JPEGImages').mkdir(parents=True)
    (root / 'PASCAL2011_animal_annotation').mkdir()
    img_dir = root / 'animalpose_image_part2' / 'dog'
    img_dir.mkdir(parents=True)
    ann_dir = root / 'animalpose_anno2' / 'dog'
    ann_dir.mkdir(parents=True)

    PIL.Image.new('RGB', (100, 60)).save(img_dir / 'do42.jpg')
    xml = '''<annotation>
      <visible_bounds xmin="11" ymin="6" width="50" height="40"/>
      <keypoints>
        <keypoint name="Nose" visible="1" x="20" y="15" z="0"/>
        <keypoint name="L_Eye" visible="1" x="25" y="12" z="0"/>
        <keypoint name="TailBase" visible="0" x="70" y="40" z="0"/>
      </keypoints>
    </annotation>'''
    with open(ann_dir / 'do42.xml', 'w') as f:
        f.write(xml)
    with open(root / 'train.txt', 'w') as f:
        f.write('do42.jpg\n')
    with open(root / 'val.txt', 'w') as f:
        f.write('')

    out = tmp_path / 'out'
    conv = VocToCoco(str(root), str(out))
    conv.process()

    with open(out / 'annotations' / 'animal_keypoints_20_train.json') as f:
        j = json.load(f)
    assert len(j['images']) == 1
    ann, = j['annotations']
    assert ann['num_keypoints'] == 2  # invisible TailBase dropped
    kps = np.asarray(ann['keypoints']).reshape(-1, 3)
    assert len(kps) == 20
    assert kps[0].tolist() == [20.0, 15.0, 2.0]  # Nose
    assert ann['bbox'] == [10, 5, 50, 40]
    # image copied into the split folder
    assert (out / 'images' / 'train' / 'do42.jpg').exists()
