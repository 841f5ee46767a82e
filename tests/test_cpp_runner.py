"""Standalone C++ deployment runner (cpp/) end-to-end.

Counterpart of the reference ``tests/test_cmake.py``: cmake-build the C++
CLI, export a SavedModel with the in-graph decoder, and run JPEG -> poses
with no Python in the serving path.
"""

import json
import os
import shutil
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FIXTURE_IMAGE = '/root/reference/tests/coco/images/puppy_dog.jpg'


@pytest.mark.skipif(shutil.which('cmake') is None, reason='cmake not found')
def test_cmake_build_and_run(tmp_path):
    pytest.importorskip('tensorflow')
    if not os.path.exists(FIXTURE_IMAGE):
        pytest.skip('fixture image not available')

    build_dir = tmp_path / 'build'
    subprocess.run(
        ['cmake', '-B', str(build_dir), '-S', os.path.join(ROOT, 'cpp')],
        check=True, capture_output=True)
    subprocess.run(
        ['cmake', '--build', str(build_dir)],
        check=True, capture_output=True)
    binary = build_dir / 'openpifpaf-tpu-image'
    assert binary.exists()

    # export a small SavedModel with the decoder in-graph
    sm_dir = str(tmp_path / 'savedmodel')
    subprocess.run(
        [sys.executable, '-m', 'openpifpaf_tpu.export',
         '--basenet', 'resnet18', '--dataset', 'cocokp',
         '--format', 'savedmodel', '--with-decoder',
         '--input-height', '97', '--input-width', '129',
         '--outfile', sm_dir],
        check=True, capture_output=True, cwd=ROOT,
        env=dict(os.environ, JAX_PLATFORMS='cpu'))

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
