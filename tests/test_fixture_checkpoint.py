"""End-to-end quality pin on a committed *trained* checkpoint.

The repo's analogue of the reference's exactly-5-people CLI test
(``/root/reference/tests/test_clis.py:61-81``): a small checkpoint
overfit on the 1-image COCO fixture is committed under
``tests/fixtures/``, and default CI runs the full predict CLI on the
fixture image asserting a stable pose (count, visibility, location)
plus the eval CLI asserting AP — so a *trained, converted-through-
checkpoint-io* model is pinned end to end on every run, not only when
RUN_SLOW re-trains one (``test_overfit.py``).

The fixture GT is degenerate (all 17 keypoints at (100, 100), 40 px
box — see test_overfit.py's docstring), so assertions use the robust
invariants: person found, all joints visible, joints within a few px
of the GT point, AP >= 0.5 and AP@OKS.5 >= 0.9.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

PYTHON = sys.executable
HERE = os.path.dirname(os.path.abspath(__file__))
CKPT = os.path.join(HERE, 'fixtures', 'overfit_fixture')
ANN = '/root/reference/tests/coco/train1.json'
IMG_DIR = '/root/reference/tests/coco/images'
IMAGE = os.path.join(IMG_DIR, 'puppy_dog.jpg')

ENV = dict(os.environ, JAX_PLATFORMS='cpu',
           PYTHONPATH=os.path.dirname(HERE))
ENV['XLA_FLAGS'] = ' '.join(
    f for f in ENV.get('XLA_FLAGS', '').split()
    if 'force_host_platform_device_count' not in f)

pytestmark = pytest.mark.skipif(
    not os.path.exists(CKPT + '.json') or not os.path.exists(ANN),
    reason='fixture checkpoint or reference fixtures not available')


def test_predict_cli_finds_the_person(tmp_path):
    pred_file = str(tmp_path / 'pred.json')
    proc = subprocess.run(
        [PYTHON, '-m', 'openpifpaf_tpu.predict', IMAGE,
         '--checkpoint', CKPT, '--long-edge', '161',
         '--json-output', pred_file],
        env=ENV, capture_output=True, timeout=600)
    assert proc.returncode == 0, proc.stderr.decode()[-2000:]

    preds = json.load(open(pred_file))
    assert len(preds) == 1          # stable count, like the reference's 5
    assert preds[0]['score'] > 0.3

    gt = json.load(open(ANN))['annotations'][0]
    gt_kps = np.asarray(gt['keypoints'], np.float32).reshape(-1, 3)
    pk = np.asarray(preds[0]['keypoints'], np.float32).reshape(-1, 3)
    assert int((pk[:, 2] > 0).sum()) == 17
    err = np.linalg.norm(pk[:, :2] - gt_kps[:, :2], axis=1)
    assert float(err.mean()) < 10.0, f'mean joint error {err.mean():.1f} px'


def test_eval_cli_ap(tmp_path):
    out = str(tmp_path / 'eval')
    proc = subprocess.run(
        [PYTHON, '-m', 'openpifpaf_tpu.eval', '--dataset', 'cocokp',
         '--cocokp-val-annotations', ANN,
         '--cocokp-val-image-dir', IMG_DIR,
         '--coco-eval-long-edge', '161',
         '--checkpoint', CKPT, '--output', out],
        env=ENV, capture_output=True, timeout=600)
    assert proc.returncode == 0, proc.stderr.decode()[-2000:]
    stats = json.load(open(out + '.stats.json'))
    assert stats['stats'][0] >= 0.5   # COCO AP
    assert stats['stats'][1] >= 0.9   # AP@OKS.5: person always found
