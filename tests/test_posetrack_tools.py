"""Posetrack tooling: skeleton figure renderer and the standalone
normalization transforms (role of reference
``plugins/posetrack/draw_poses.py`` / ``normalize_transform.py``)."""

import numpy as np
import PIL.Image
import pytest

matplotlib = pytest.importorskip('matplotlib')


def test_draw_poses(tmp_path, monkeypatch):
    monkeypatch.setenv('MPLBACKEND', 'Agg')
    matplotlib.use('Agg', force=True)
    from openpifpaf_tpu.plugins.posetrack import draw_poses

    draw_poses.main(str(tmp_path))
    produced = sorted(p.name for p in tmp_path.iterdir())
    assert produced == ['coco_skeleton_forward.png',
                        'skeleton_overview.png',
                        'skeleton_posetrack.png',
                        'skeleton_tracking.png',
                        'skeleton_tracking_forward.png']
    for p in tmp_path.iterdir():
        assert p.stat().st_size > 1000


def test_normalize_posetrack():
    from openpifpaf_tpu.plugins.posetrack.normalize import (
        NormalizePosetrack)

    image = PIL.Image.new('RGB', (200, 150))
    kps = [[0.0, 0.0, 0.0]] * 17
    kps[0] = [50.0, 40.0, 1.0]    # annotated -> becomes visible
    kps[1] = [-5.0, 40.0, 1.0]    # out of frame -> dropped
    kps[2] = [50.0, 500.0, 1.0]   # out of frame -> dropped
    raw = {
        'image': {'frame_id': 7,
                  'ignore_regions_x': [[10, 30, 30, 10]],
                  'ignore_regions_y': [[10, 10, 30, 30]]},
        'annotations': [
            {'keypoints': kps, 'bbox': [40, 30, 30, 30], 'track_id': 0},
        ],
    }

    _, anns, meta = NormalizePosetrack()(image, raw, None)
    assert meta['valid_area'].tolist() == [0.0, 0.0, 199.0, 149.0]
    person, crowd = anns
    assert person['image_id'] == 7
    assert person['keypoints'][0, 2] == 2.0
    assert person['keypoints'][1, 2] == 0.0
    assert person['keypoints'][2, 2] == 0.0
    assert not person['iscrowd']
    assert crowd['iscrowd'] and crowd['track_id'] == -1
    assert np.asarray(crowd['bbox']).tolist() == [10, 10, 20, 20]


def test_normalize_mot():
    from openpifpaf_tpu.plugins.posetrack.normalize import NormalizeMOT

    image = PIL.Image.new('RGB', (100, 80))
    anns = [{'keypoints': [[1.0, 2.0, 2.0]] * 17,
             'bbox': [0, 0, 10, 10], 'segmentation': None}]
    _, out, meta = NormalizeMOT()(image, anns, None)
    assert out[0]['keypoints'].shape == (17, 3)
    assert 'segmentation' not in out[0]
    assert meta['valid_area'].tolist() == [0.0, 0.0, 100.0, 80.0]
