"""Decoder ablation flags (reference decoder/cifcaf.py:127-211 +
factory.py:40-45): CLI mapping and functional decode under each ablation."""

import argparse
import sys

import numpy as np
import pytest

sys.path.insert(0, 'tests')

import openpifpaf_tpu
from openpifpaf_tpu import decoder as decoder_mod
from openpifpaf_tpu.decoder.cifcaf import CifCaf
from openpifpaf_tpu.ops import CifCafDecoderConfig, build_cifcaf_decoder


def parse_and_configure(argv):
    parser = argparse.ArgumentParser()
    decoder_mod.factory.cli(parser)
    args = parser.parse_args(argv)
    decoder_mod.factory.configure(args)
    return args


@pytest.fixture(autouse=True)
def restore_cifcaf_statics():
    saved = {k: getattr(CifCaf, k) for k in dir(CifCaf)
             if not k.startswith('_') and not callable(getattr(CifCaf, k))}
    yield
    for k, v in saved.items():
        setattr(CifCaf, k, v)


def test_flag_mapping():
    parse_and_configure([
        '--cif-th', '0.25', '--caf-th', '0.35',
        '--force-complete-pose', '--force-complete-caf-th', '0.01',
        '--nms-before-force-complete', '--cifcaf-block-joints',
        '--ablation-cifseeds-nms', '--ablation-cifseeds-no-rescore',
        '--ablation-caf-no-rescore', '--ablation-independent-kp',
    ])
    assert CifCaf.cifhr_threshold == 0.25
    assert CifCaf.caf_score_th == 0.35
    assert CifCaf.force_complete_caf_th == 0.01
    assert CifCaf.nms_before_force_complete
    assert CifCaf.block_joints
    assert CifCaf.seed_ablation_nms
    assert not CifCaf.seed_rescore
    assert not CifCaf.caf_rescore
    # independent-kp keeps the growth keypoint threshold under
    # force-complete
    assert CifCaf.keypoint_threshold == 0.15
    assert CifCaf.keypoint_threshold_rel == 0.0

    datamodule = openpifpaf_tpu.datasets.factory('cocokp')
    for i, m in enumerate(datamodule.head_metas):
        m.head_index = i
        m.base_stride = 16
    dec = CifCaf(*datamodule.head_metas)
    cfg = dec.config
    assert cfg.cifhr_skip  # both no-rescore ablations -> skip CifHr
    assert cfg.seed_ablation_nms and not cfg.seed_rescore
    assert cfg.block_joints and cfg.nms_before_force_complete


@pytest.mark.parametrize('overrides', [
    {'seed_ablation_nms': True},
    {'seed_rescore': False, 'caf_rescore': False, 'cifhr_skip': True,
     'seed_threshold': 0.1},
    {'block_joints': True},
    {'force_complete': True, 'nms_before_force_complete': True,
     'keypoint_threshold': 0.0, 'keypoint_threshold_rel': 0.0,
     'nms_keypoint_threshold': 0.0},
])
def test_ablation_decode_runs(overrides):
    import field_fixtures

    rng = np.random.RandomState(0)
    ann = field_fixtures.annotation_dict(
        field_fixtures.synthetic_person(120.0, 140.0, 110.0, rng))
    cif, caf, _ = field_fixtures.fields_from_annotations(
        [ann], (241, 321), stride=16)

    datamodule = openpifpaf_tpu.datasets.factory('cocokp')
    cif_meta, caf_meta = datamodule.head_metas
    config = CifCafDecoderConfig(n_seeds=64, n_poses=16, **overrides)
    dec = build_cifcaf_decoder(
        stride=16, skeleton=caf_meta.skeleton,
        n_keypoints=len(cif_meta.keypoints), config=config)
    poses, keep, order = dec(cif[None], caf[None])
    poses = np.asarray(poses)[0]
    keep = np.asarray(keep)[0]
    assert keep.sum() >= 1  # the synthetic person is found
    best = poses[np.asarray(order)[0][0]]
    found = best[:, 0] > 0.1
    assert found.sum() >= 10
