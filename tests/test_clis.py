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


@pytest.mark.skipif(not os.path.exists(TEST_IMAGE),
                    reason='reference fixture not available')
def test_video_still_image(tmp_path):
    """Video CLI on a still image as a 1-frame stream (reference
    tests/test_clis.py video test)."""
    json_out = str(tmp_path / 'video.json')
    out = subprocess.run(
        [PYTHON, '-m', 'openpifpaf_tpu.video',
         '--source', TEST_IMAGE, '--long-edge', '161',
         '--json-output', json_out],
        capture_output=True, env=ENV, timeout=500)
    assert out.returncode == 0, out.stderr.decode()
    with open(json_out) as f:
        lines = [json.loads(line) for line in f if line.strip()]
    assert len(lines) == 1
    assert lines[0]['frame'] == 1
    assert isinstance(lines[0]['predictions'], list)


@pytest.mark.slow
def test_eval_fixture_dataset(tmp_path):
    """Eval CLI end-to-end on the 1-image fixture dataset: writes the
    stats json with AP and timing fields (reference eval.py:177-214)."""
    output = str(tmp_path / 'evalout')
    out = subprocess.run(
        [PYTHON, '-m', 'openpifpaf_tpu.eval',
         '--dataset', 'cocokp',
         '--cocokp-val-annotations', '/root/reference/tests/coco/train1.json',
         '--cocokp-val-image-dir', '/root/reference/tests/coco/images',
         '--coco-eval-long-edge', '161',
         '--output', output, '--write-predictions'],
        capture_output=True, env=ENV, timeout=500)
    assert out.returncode == 0, out.stderr.decode()
    with open(output + '.stats.json') as f:
        stats = json.load(f)
    assert 'stats' in stats or 'AP' in str(stats)


@pytest.mark.skipif(not os.path.exists(TEST_IMAGE),
                    reason='reference fixture not available')
def test_video_tracking_checkpoint(tmp_path):
    """Video CLI with a (converted) tracking checkpoint runs the full
    TrackingShell + feature-cache + TCAF + TrackingPose path."""
    import torch
    sys.path.insert(0, os.path.join(os.path.dirname(__file__)))
    import torch_ref

    torch.manual_seed(0)
    ckpt = str(tmp_path / 'tracking.pkl')
    torch.save({'model': torch_ref.build_tracking_shell(), 'epoch': 0,
                'meta': {}}, ckpt)

    json_out = str(tmp_path / 'track.json')
    out = subprocess.run(
        [PYTHON, '-m', 'openpifpaf_tpu.video',
         '--source', f'{TEST_IMAGE},{TEST_IMAGE}',
         '--checkpoint', ckpt, '--long-edge', '161',
         '--json-output', json_out],
        capture_output=True, env=ENV, timeout=500)
    assert out.returncode == 0, out.stderr.decode()[-2000:]
    with open(json_out) as f:
        lines = [json.loads(line) for line in f if line.strip()]
    assert [l['frame'] for l in lines] == [1, 2]


@pytest.mark.skipif(not os.path.exists(TEST_IMAGE),
                    reason='reference fixture not available')
def test_predict_debug_indices(tmp_path):
    """--debug-indices + --save-all produce field overlay plots
    (reference visualizer/cli.py + --debug-indices)."""
    out_dir = str(tmp_path / 'plots')
    result = subprocess.run(
        [PYTHON, '-m', 'openpifpaf_tpu.predict', TEST_IMAGE,
         '--long-edge', '161', '--debug-indices', 'cif:5', 'caf:3',
         '--save-all', out_dir,
         '--json-output', str(tmp_path / 'p.json')],
        capture_output=True, env=dict(ENV, MPLBACKEND='Agg'), timeout=500)
    assert result.returncode == 0, result.stderr.decode()[-2000:]
    plots = os.listdir(out_dir)
    assert len(plots) >= 2  # confidence + regression per requested field


def test_export_tflite(tmp_path):
    """TFLite export (mobile counterpart of the reference CoreML export)
    round-trips through the TFLite interpreter."""
    outfile = str(tmp_path / 'model.tflite')
    out = subprocess.run(
        [PYTHON, '-m', 'openpifpaf_tpu.export',
         '--basenet', 'cifar10net', '--dataset', 'cifar10',
         '--input-height', '33', '--input-width', '33',
         '--format', 'tflite', '--outfile', outfile],
        capture_output=True, env=ENV, timeout=500)
    assert out.returncode == 0, out.stderr.decode()[-2000:]
    assert os.path.getsize(outfile) > 1000

    import numpy as np
    import tensorflow as tf
    interp = tf.lite.Interpreter(model_path=outfile)
    interp.allocate_tensors()
    inp = interp.get_input_details()[0]
    assert list(inp['shape']) == [1, 33, 33, 3]
    interp.set_tensor(inp['index'],
                      np.zeros((1, 33, 33, 3), dtype=np.float32))
    interp.invoke()
    outs = [interp.get_tensor(d['index'])
            for d in interp.get_output_details()]
    assert outs and all(np.all(np.isfinite(o)) for o in outs)
