"""Standalone C++ deployment runners (cpp/) end-to-end.

Counterpart of the reference ``tests/test_cmake.py``: cmake-build the C++
CLIs, export a SavedModel with the in-graph decoder, and run JPEG -> poses
(and video -> per-frame poses) with no Python in the serving path.
"""

import json
import os
import shutil
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FIXTURE_IMAGE = '/root/reference/tests/coco/images/puppy_dog.jpg'


@pytest.fixture(scope='module')
def cpp_build(tmp_path_factory):
    """cmake-build the runners and export a small SavedModel once."""
    if shutil.which('cmake') is None:
        pytest.skip('cmake not found')
    pytest.importorskip('tensorflow')
    if not os.path.exists(FIXTURE_IMAGE):
        pytest.skip('fixture image not available')

    tmp_path = tmp_path_factory.mktemp('cpp')
    build_dir = tmp_path / 'build'
    subprocess.run(
        ['cmake', '-B', str(build_dir), '-S', os.path.join(ROOT, 'cpp')],
        check=True, capture_output=True)
    subprocess.run(
        ['cmake', '--build', str(build_dir), '-j'],
        check=True, capture_output=True)

    sm_dir = str(tmp_path / 'savedmodel')
    subprocess.run(
        [sys.executable, '-m', 'openpifpaf_tpu.export',
         '--basenet', 'resnet18', '--dataset', 'cocokp',
         '--format', 'savedmodel', '--with-decoder',
         '--input-height', '97', '--input-width', '129',
         '--outfile', sm_dir],
        check=True, capture_output=True, cwd=ROOT,
        env=dict(os.environ, JAX_PLATFORMS='cpu'))
    return build_dir, sm_dir


def test_cpp_image_runner(cpp_build):
    build_dir, sm_dir = cpp_build
    binary = build_dir / 'openpifpaf-tpu-image'
    assert binary.exists()

    out = subprocess.run(
        [str(binary), '--model', sm_dir,
         '--input-height', '97', '--input-width', '129',
         FIXTURE_IMAGE],
        check=True, capture_output=True, text=True)
    line = out.stdout.strip().splitlines()[-1]
    result = json.loads(line)
    assert result['file'] == FIXTURE_IMAGE
    # random weights: predictions may be empty, but must be a valid list
    assert isinstance(result['predictions'], list)
    for pred in result['predictions']:
        assert 'score' in pred
        assert len(pred['keypoints']) == 17 * 3


def test_cpp_video_runner(cpp_build, tmp_path):
    build_dir, sm_dir = cpp_build
    binary = build_dir / 'openpifpaf-tpu-video'
    if not binary.exists():
        pytest.skip('OpenCV not available: video runner not built')

    cv2 = pytest.importorskip('cv2')
    import numpy as np
    video_path = str(tmp_path / 'clip.avi')
    writer = cv2.VideoWriter(
        video_path, cv2.VideoWriter_fourcc(*'MJPG'), 10.0, (129, 97))
    rng = np.random.RandomState(0)
    for _ in range(3):
        writer.write(rng.randint(0, 255, (97, 129, 3), dtype=np.uint8))
    writer.release()

    rendered = str(tmp_path / 'out.avi')
    out = subprocess.run(
        [str(binary), '--model', sm_dir, '--source', video_path,
         '--input-height', '97', '--input-width', '129',
         '--max-frames', '2', '--video-output', rendered],
        check=True, capture_output=True, text=True)
    lines = out.stdout.strip().splitlines()
    assert len(lines) == 2
    for i, line in enumerate(lines):
        result = json.loads(line)
        assert result['frame'] == i
        assert isinstance(result['predictions'], list)
    assert os.path.exists(rendered)
