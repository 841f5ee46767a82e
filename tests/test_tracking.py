"""Tracking stack tests: tracking model forward, cocokpst pipeline, and
TrackingPose decoding on synthetic fields."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import openpifpaf_tpu
from openpifpaf_tpu.models import factory as models_factory
from openpifpaf_tpu.plugins.posetrack.cocokpst import CocoKpSt
from openpifpaf_tpu.plugins.coco.cocokp import CocoKp

FIXTURE_ANN = '/root/reference/tests/coco/train1.json'
FIXTURE_IMAGES = '/root/reference/tests/coco/images'

requires_fixture = pytest.mark.skipif(
    not os.path.exists(FIXTURE_ANN), reason='reference fixture not available')


def build_tracking_model():
    datamodule = openpifpaf_tpu.datasets.factory('cocokpst')
    net_factory = models_factory.Factory(base_name='resnet18')
    model, init_fn = net_factory.from_scratch(datamodule.head_metas)
    variables = init_fn(jax.random.PRNGKey(0), (2, 97, 129, 3))
    return datamodule, model, variables


def test_tracking_forward_shapes():
    _, model, variables = build_tracking_model()
    # interleaved pair batch of 2 pairs
    dummy = jnp.zeros((4, 97, 129, 3))
    (cif, caf, tcaf), _ = model.apply(variables, dummy, train=True,
                                      mutable=['batch_stats'])
    # single-image heads only see primary frames
    assert cif.shape == (2, 17, 5, 7, 9)
    assert caf.shape == (2, 19, 8, 7, 9)
    # tcaf: one output per pair
    assert tcaf.shape == (2, 17, 8, 7, 9)


def test_tracking_loss():
    from openpifpaf_tpu.training import losses

    datamodule, model, variables = build_tracking_model()
    loss_fn = losses.Factory().factory(datamodule.head_metas)

    dummy = jnp.zeros((2, 97, 129, 3))
    outputs, _ = model.apply(variables, dummy, train=True,
                             mutable=['batch_stats'])

    cif_t = np.full((1, 17, 5, 7, 9), np.nan, dtype=np.float32)
    caf_t = np.full((1, 19, 9, 7, 9), np.nan, dtype=np.float32)
    tcaf_t = np.full((1, 17, 9, 7, 9), np.nan, dtype=np.float32)
    for t in (cif_t, caf_t, tcaf_t):
        t[:, :, 0] = 0.0

    total, head_losses, _ = loss_fn(
        outputs, (jnp.asarray(cif_t), jnp.asarray(caf_t), jnp.asarray(tcaf_t)))
    assert np.isfinite(float(total))


@requires_fixture
def test_cocokpst_loader():
    CocoKp.train_annotations = FIXTURE_ANN
    CocoKp.train_image_dir = FIXTURE_IMAGES
    try:
        datamodule = openpifpaf_tpu.datasets.factory('cocokpst')
        for i, m in enumerate(datamodule.head_metas):
            m.head_index = i
            m.base_stride = 16
        datamodule.batch_size = 2
        loader = datamodule.train_loader()
        images, targets, metas = next(iter(loader))
        # one pair -> interleaved batch of 2 frames
        assert images.shape[0] == 2
        assert len(targets) == 3  # cif, caf, tcaf
        assert targets[0].shape[1:3] == (17, 5)
        assert targets[2].shape[1:3] == (17, 9)
    finally:
        CocoKp.train_annotations = \
            'data-mscoco/annotations/person_keypoints_train2017.json'
        CocoKp.train_image_dir = 'data-mscoco/images/train2017/'


def test_tracking_pose_decoder():
    import field_fixtures
    from openpifpaf_tpu.decoder.tracking_pose import TrackingPose

    datamodule = openpifpaf_tpu.datasets.factory('cocokpst')
    cif_meta, caf_meta, tcaf_meta = datamodule.head_metas
    for m, i in zip(datamodule.head_metas, range(3)):
        m.head_index = i
        m.base_stride = 8

    decoder = TrackingPose(cif_meta, caf_meta, tcaf_meta)
    # smaller static budgets to keep CPU compile fast
    from openpifpaf_tpu.ops import CifCafDecoderConfig
    decoder.pose_generator.config = CifCafDecoderConfig(n_seeds=256, n_poses=32)

    # synthetic fields: one person; tcaf associates identically-placed pose
    rng = np.random.RandomState(3)
    kps = field_fixtures.synthetic_person(60.0, 60.0, 80.0, rng)
    anns = [field_fixtures.annotation_dict(kps)]
    cif, caf, _ = field_fixtures.fields_from_annotations(
        anns, (129, 129), stride=8)

    # temporal field: self-association (same position both frames)
    tcaf = np.zeros((17, 8, cif.shape[2], cif.shape[3]), dtype=np.float32)
    for f in range(17):
        x, y = kps[f, 0] / 8, kps[f, 1] / 8
        i, j = int(round(x)), int(round(y))
        if 0 <= i < tcaf.shape[3] and 0 <= j < tcaf.shape[2]:
            tcaf[f, 1, j, i] = 1.0
            tcaf[f, 2, j, i] = x
            tcaf[f, 3, j, i] = y
            tcaf[f, 4, j, i] = x
            tcaf[f, 5, j, i] = y
            tcaf[f, 6, j, i] = 1.0
            tcaf[f, 7, j, i] = 1.0

    fields = [cif, caf, tcaf]

    # frame 1: new track created
    anns1 = decoder(fields)
    assert len(anns1) >= 0  # first frame may be below track thresholds

    # after a few frames the track becomes good and keeps its id
    anns2 = decoder(fields)
    anns3 = decoder(fields)
    assert len(anns3) == 1
    id3 = anns3[0].id_
    anns4 = decoder(fields)
    assert len(anns4) == 1
    assert anns4[0].id_ == id3


def test_loader_with_reset_signal():
    """LoaderWithReset emits eval_reset on sequence change and the
    Predictor's tracking feature cache resets (reference
    datasets/loader_with_reset.py:4-32 + signal.py:7-26)."""
    from openpifpaf_tpu.datasets import LoaderWithReset
    from openpifpaf_tpu.signal_ import Signal

    batches = [
        ('im0', [], [{'video_id': 'a'}]),
        ('im1', [], [{'video_id': 'a'}]),
        ('im2', [], [{'video_id': 'b'}]),
        ('im3', [], [{'video_id': 'b'}]),
    ]
    resets = []
    Signal.subscribe('eval_reset', lambda: resets.append(True))
    wrapped = LoaderWithReset(batches, 'video_id')
    assert len(wrapped) == 4
    seen = [b[0] for b in wrapped]
    assert seen == ['im0', 'im1', 'im2', 'im3']
    assert len(resets) == 1


def test_posetrack2017_eval_loader(tmp_path):
    """Posetrack2017 eval-only module reads the old annolist format and
    emits eval_reset between sequences (reference posetrack2017.py)."""
    import json
    import PIL.Image
    from openpifpaf_tpu.plugins.posetrack.posetrack2017 import Posetrack2017

    img_dir = tmp_path / 'images'
    img_dir.mkdir()
    names = []
    for i in range(3):
        name = f'images/frame_{i:04d}.jpg'
        PIL.Image.new('RGB', (65, 49), (i * 40, 0, 0)).save(tmp_path / name)
        names.append(name)
    ann = {'annolist': [
        {'image': [{'name': n}], 'annorect': []} for n in names
    ]}
    ann_file = tmp_path / 'seq1.json'
    with open(ann_file, 'w') as f:
        json.dump(ann, f)

    Posetrack2017.eval_annotations = str(tmp_path / '*.json')
    Posetrack2017.data_root = str(tmp_path)
    try:
        dm = Posetrack2017()
        assert len(dm.head_metas) == 3  # cif, caf, tcaf
        dm.batch_size = 1
        dm.loader_workers = 0
        loader = dm.eval_loader()
        batches = list(loader)
        assert len(batches) == 3
        images, anns, metas = batches[0]
        assert metas[0]['annotation_file'].endswith('seq1.json')
        assert images[0].shape[-1] == 3
        metric, = dm.metrics()
        assert metric.output_format == '2017'
    finally:
        Posetrack2017.eval_annotations = \
            'data-posetrack2017/annotations/val/*.json'
        Posetrack2017.data_root = 'data-posetrack2017'


def test_posetrack2018_normalization(tmp_path):
    """Ignore regions become crowd annotations; v=1 keypoints promote to
    visible; out-of-frame keypoints are zeroed (reference
    normalize_transform.py NormalizePosetrack)."""
    import json
    import PIL.Image
    from openpifpaf_tpu.plugins.posetrack.datasets import Posetrack2018

    (tmp_path / 'images').mkdir()
    PIL.Image.new('RGB', (65, 49)).save(tmp_path / 'images' / 'f0.jpg')
    ann = {
        'images': [{
            'frame_id': 0, 'file_name': 'images/f0.jpg', 'id': 0,
            'ignore_regions_x': [[1, 10, 10, 1]],
            'ignore_regions_y': [[1, 1, 10, 10]],
        }],
        'annotations': [{
            'image_id': 0, 'track_id': 0,
            'bbox': [0, 0, 30, 30],
            'keypoints': ([20.0, 20.0, 1.0] + [200.0, 20.0, 1.0]
                          + [0.0, 0.0, 0.0] * 15),
        }],
    }
    with open(tmp_path / 'seq.json', 'w') as f:
        json.dump(ann, f)

    ds = Posetrack2018(
        str(tmp_path / '*.json'), str(tmp_path),
        preprocess=lambda i, a, m: (i, a, m), group=(0,))
    _, anns, _ = ds[0]
    frame_anns = anns[0]
    person = [a for a in frame_anns if not a['iscrowd']][0]
    crowd = [a for a in frame_anns if a['iscrowd']]
    assert len(crowd) == 1  # from the ignore region
    assert crowd[0]['bbox'][2] == 9
    assert person['keypoints'][0, 2] == 2.0  # v=1 -> visible
    assert person['keypoints'][1, 2] == 0.0  # x=200 out of 65-px frame
