"""CLI integration tests (reference ``tests/test_clis.py`` and
``tests/test_help.py``): every CLI's --help must run; predict produces a
JSON output on a real image."""

import json
import os
import subprocess
import sys

import pytest

PYTHON = sys.executable
ENV = dict(os.environ, JAX_PLATFORMS='cpu', PYTHONPATH=os.getcwd())

CLI_MODULES = [
    'openpifpaf_tpu.predict',
    'openpifpaf_tpu.train',
    'openpifpaf_tpu.eval_cli',
    'openpifpaf_tpu.video',
    'openpifpaf_tpu.benchmark',
    'openpifpaf_tpu.logs',
    'openpifpaf_tpu.export',
    'openpifpaf_tpu.count_ops',
    'openpifpaf_tpu.migrate',
]

TEST_IMAGE = '/root/reference/tests/coco/images/puppy_dog.jpg'


@pytest.mark.parametrize('module', CLI_MODULES)
def test_help(module):
    out = subprocess.run(
        [PYTHON, '-m', module, '--help'],
        capture_output=True, env=ENV, timeout=240)
    assert out.returncode == 0, out.stderr.decode()


@pytest.mark.skipif(not os.path.exists(TEST_IMAGE),
                    reason='reference fixture not available')
def test_predict_json(tmp_path):
    """Run predict with a randomly initialized model (no checkpoint) and
    verify a valid prediction JSON is produced."""
    out_file = tmp_path / 'puppy.predictions.json'
    cmd = [
        PYTHON, '-m', 'openpifpaf_tpu.predict',
        TEST_IMAGE,
        '--long-edge', '161',
        '--json-output', str(out_file),
    ]
    out = subprocess.run(cmd, capture_output=True, env=ENV, timeout=500)
    assert out.returncode == 0, out.stderr.decode()
    assert out_file.exists()
    with open(out_file) as f:
        predictions = json.load(f)
    assert isinstance(predictions, list)
