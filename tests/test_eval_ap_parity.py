"""Cross-framework end-to-end eval-AP parity.

Runs the FULL eval pipeline — preprocess -> NN forward -> decode ->
inverse_transform -> COCO AP — on a small fixture dataset and asserts
framework equality at every seam:

  (a) this repo's pipeline end to end: eval preprocessing, flax forward,
      batched device CifCaf decode, inverse transform, CocoEval (what
      ``python -m openpifpaf_tpu.eval`` runs; reference ``eval.py:147-214``,
      ``metric/coco.py:38-163``);
  (b) NN seam: the reference-layout torch model (tests/torch_ref.py) with
      the SAME (converted) weights produces the same composite fields on
      the same preprocessed images;
  (c) decoder+metric seam: the reference's own C++ CifCaf decoder
      (compiled from /root/reference/src/openpifpaf/csrc) decodes those
      fields, its annotations go through the same inverse transform and
      CocoEval, and the AP/AR stats must be IDENTICAL.

Splitting (b) from (c) makes the test deterministic: decoder thresholds
are step functions, so piping two float-different NN outputs into two
decoders would flake whenever a junk seed lands within float-noise of a
threshold. Seam (b) bounds the NN difference; seam (c) is exact because
both decoders consume bit-identical fields — and on non-saturating
fields (hr < 1 everywhere, asserted below) the reference's
revision-counter CifHr (``cif_hr.cpp:84-86``) and this repo's clamped-sum
CifHr agree exactly, so pose-level equality is required, not just close.

Weights are torch-random with sculpted head confidence/scale channels
(x30 gain, -1 bias on confidences; +3 on scale biases) so the untrained
network still yields well-separated seeds and a handful of decodable
poses — parity of junk poses through the full metric stack is as strong
a check as parity of good ones.
"""

import argparse
import json
import os
import sys

import numpy as np
import pytest
import torch

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import torch_ref  # noqa: E402
from test_reference_parity import _load_reference_decoder  # noqa: E402

import openpifpaf_tpu  # noqa: E402
from openpifpaf_tpu import datasets  # noqa: E402
from openpifpaf_tpu.annotation import Annotation  # noqa: E402
from openpifpaf_tpu.models import convert_torch  # noqa: E402
from openpifpaf_tpu.predictor import Predictor  # noqa: E402

FIXTURE_ANN = '/root/reference/tests/coco/train1.json'
FIXTURE_IMG_DIR = '/root/reference/tests/coco/images'
EXTRA_IMAGE = '/root/reference/docs/coco/000000081988.jpg'

requires_fixture = pytest.mark.skipif(
    not os.path.exists(FIXTURE_ANN), reason='reference fixture not available')


def _build_fixture_dataset(tmp_path):
    """2-image COCO eval set: the reference's 1-image fixture plus the
    5-person documentation image with synthetic GT keypoints."""
    with open(FIXTURE_ANN) as f:
        coco = json.load(f)

    img_dir = tmp_path / 'images'
    img_dir.mkdir()
    for im in coco['images']:
        os.symlink(os.path.join(FIXTURE_IMG_DIR, im['file_name']),
                   img_dir / im['file_name'])

    os.symlink(EXTRA_IMAGE, img_dir / 'crowd.jpg')
    import PIL.Image
    with PIL.Image.open(EXTRA_IMAGE) as f:
        w, h = f.size
    coco['images'].append({'id': 900, 'file_name': 'crowd.jpg',
                           'width': w, 'height': h})
    rng = np.random.RandomState(0)
    next_id = max(a['id'] for a in coco['annotations']) + 1
    for p in range(3):
        cx, cy = 80.0 + p * 150.0, h / 2.0
        kps = []
        for k in range(17):
            kps += [float(cx + rng.uniform(-40, 40)),
                    float(cy + rng.uniform(-90, 90)), 2]
        coco['annotations'].append({
            'id': next_id + p, 'image_id': 900, 'category_id': 1,
            'iscrowd': 0, 'keypoints': kps, 'num_keypoints': 17,
            'bbox': [cx - 50, cy - 100, 100, 200], 'area': 100.0 * 200.0,
        })

    ann_file = tmp_path / 'eval.json'
    with open(ann_file, 'w') as f:
        json.dump(coco, f)
    return str(ann_file), str(img_dir)


def _sculpted_torch_shell():
    """Random-init reference-layout model with head confidence channels
    gained (x30, -1) and scale-channel biases raised (+3): seeds become
    well-separated from thresholds and splats overlap enough for the
    CifHr consensus rescore to pass them."""
    torch.manual_seed(3)
    shell = torch_ref.build_shell('shufflenetv2k16')
    torch_ref.randomize_batch_norm_stats(shell)
    shell.eval()
    with torch.no_grad():
        for hn, n_ch, scale_idx in ((shell.head_nets[0], 5, (4,)),
                                    (shell.head_nets[1], 9, (7, 8))):
            w, b = hn.conv.weight, hn.conv.bias
            n_fields = w.shape[0] // n_ch
            for f in range(n_fields):
                conf = f * n_ch + 1
                # -2.0 keeps the active-cell counts inside the decoder's
                # fast-tier budgets, so neither framework truncates
                w[conf] *= 30.0
                b[conf] = b[conf] * 30.0 - 2.0
                for si in scale_idx:
                    b[f * n_ch + si] += 3.0
    return shell


def _poses_to_annotations(poses, head_metas):
    """Reference C++ output (N, 17, 4) [v, x, y, s] in hi-res pixels ->
    Annotation objects (mirrors the reference's ``cifcaf.py:224-277``)."""
    cif_meta, caf_meta = head_metas
    anns = []
    for pose in np.asarray(poses):
        ann = Annotation(cif_meta.keypoints, caf_meta.skeleton,
                         score_weights=cif_meta.score_weights)
        ann.data[:, 0] = pose[:, 1]
        ann.data[:, 1] = pose[:, 2]
        ann.data[:, 2] = pose[:, 0]
        ann.joint_scales = pose[:, 3].copy()
        anns.append(ann)
    anns.sort(key=lambda a: -a.score)
    return anns


THR = dict(seed=0.2, kp=0.05, instance=0.01)


@requires_fixture
def test_eval_ap_parity(tmp_path):
    torch_mod = _load_reference_decoder()
    ann_file, img_dir = _build_fixture_dataset(tmp_path)

    shell_t = _sculpted_torch_shell()
    ckpt = str(tmp_path / 'ckpt.pkl')
    torch.save({'model': shell_t, 'epoch': 0,
                'meta': {'args': argparse.Namespace(
                    basenet='shufflenetv2k16')}}, ckpt)
    base_name, head_metas, variables, _ = convert_torch.convert_checkpoint(
        ckpt)
    assert base_name == 'shufflenetv2k16'

    from openpifpaf_tpu.models import factory as models_factory
    from openpifpaf_tpu.models.shell import Shell, assign_strides
    base_net = models_factory.BASE_FACTORIES[base_name]()
    assign_strides(head_metas, base_net.stride)
    head_nets = tuple(models_factory.HEADS[type(m)](meta=m)
                      for m in head_metas)
    model_f = Shell(base_net=base_net, head_nets=head_nets)
    stride = head_metas[0].stride
    assert stride == 16

    from openpifpaf_tpu.plugins.coco.cocokp import CocoKp
    from openpifpaf_tpu.decoder.cifcaf import CifCaf
    saved = {k: getattr(CocoKp, k) for k in
             ('eval_annotations', 'eval_image_dir', 'eval_long_edge',
              'batch_size', 'loader_workers')}
    saved_thr = {k: getattr(CifCaf, k) for k in
                 ('seed_threshold', 'instance_threshold',
                  'keypoint_threshold', 'keypoint_threshold_nms')}
    try:
        CocoKp.eval_annotations = ann_file
        CocoKp.eval_image_dir = img_dir
        CocoKp.eval_long_edge = 193
        CocoKp.batch_size = 1
        CocoKp.loader_workers = 0
        CifCaf.seed_threshold = THR['seed']
        CifCaf.keypoint_threshold = THR['kp']
        CifCaf.keypoint_threshold_nms = THR['kp']
        CifCaf.instance_threshold = THR['instance']
        datamodule = datasets.factory('cocokp')

        # ---- (a) this repo's full eval pipeline, capturing the NN
        # fields at the decoder seam
        predictor = Predictor(model=model_f, variables=variables)
        # no size bucketing: the torch side consumes the identical
        # unpadded preprocessed image for the exact seam comparison
        predictor.size_bucket = 0
        metric_ours = datamodule.metrics()[0]
        preds_ours = {}
        fields_by_image = {}
        for batch in datamodule.eval_loader():
            image_batch, gt_anns, metas = batch[-3], batch[-2], batch[-1]
            fields = predictor.fields_batch(image_batch)
            pred_batch = predictor.processor.batch_decode(fields)
            meta = metas[0]
            pred = [ann.inverse_transform(meta) for ann in pred_batch[0]]
            metric_ours.accumulate(pred, meta, ground_truth=gt_anns[0])
            preds_ours[meta['image_id']] = pred
            fields_by_image[meta['image_id']] = (
                np.asarray(fields[0][0]), np.asarray(fields[1][0]),
                np.asarray(image_batch)[0], meta)
        stats_ours = metric_ours.stats()

        # ---- (b) NN seam: reference-layout torch forward on the same
        # preprocessed images reproduces the fields
        import bench_torch_cpu
        for image_id, (cif_f, caf_f, img, _) in fields_by_image.items():
            with torch.no_grad():
                cif_raw, caf_raw = shell_t(torch.from_numpy(
                    img.transpose(2, 0, 1)[None].copy()))
                cif_t = bench_torch_cpu._cf4_inference(cif_raw, n_vectors=1)
                caf_t = bench_torch_cpu._cf4_inference(caf_raw, n_vectors=2)
            np.testing.assert_allclose(cif_f, cif_t[0].numpy(), atol=2e-3,
                                       err_msg=f'cif image {image_id}')
            np.testing.assert_allclose(caf_f, caf_t[0].numpy(), atol=2e-3,
                                       err_msg=f'caf image {image_id}')

        # ---- (c) decoder+metric seam: the reference C++ decoder on the
        # SAME fields -> same inverse transform -> same CocoEval
        utils = torch_mod.classes.openpifpaf_decoder_utils
        ref_cifcaf = torch_mod.classes.openpifpaf_decoder.CifCaf
        saved_cpp = (utils.CifSeeds.get_threshold(),
                     ref_cifcaf.get_keypoint_threshold(),
                     ref_cifcaf.get_keypoint_threshold_rel(),
                     utils.NMSKeypoints.get_instance_threshold(),
                     utils.NMSKeypoints.get_keypoint_threshold())
        utils.CifSeeds.set_threshold(THR['seed'])
        ref_cifcaf.set_keypoint_threshold(THR['kp'])
        utils.NMSKeypoints.set_instance_threshold(THR['instance'])
        utils.NMSKeypoints.set_keypoint_threshold(THR['kp'])
        try:
            skeleton = np.asarray(datamodule.head_metas[1].skeleton,
                                  dtype=np.int64)
            ref_dec = ref_cifcaf(17, torch_mod.from_numpy(skeleton) - 1)
            metric_ref = datamodule.metrics()[0]
            preds_ref = {}
            for image_id, (cif_f, caf_f, _, meta) in \
                    fields_by_image.items():
                # non-saturation precondition for exact CifHr agreement
                hr = torch_mod.classes.openpifpaf_decoder_utils.CifHr()
                hr.reset(list(cif_f.shape), stride)
                hr.accumulate(torch.from_numpy(cif_f.copy()), stride,
                              0.0, 1.0)
                acc, rev = hr.get_accumulated()
                assert float((acc - rev).max()) < 0.99, \
                    'CifHr saturated: exact parity precondition violated'

                poses, _ = ref_dec.call(torch.from_numpy(cif_f.copy()),
                                        stride,
                                        torch.from_numpy(caf_f.copy()),
                                        stride)
                anns = _poses_to_annotations(poses.numpy(),
                                             datamodule.head_metas)
                anns = [a.inverse_transform(meta) for a in anns]
                metric_ref.accumulate(anns, meta)
                preds_ref[image_id] = anns
            stats_ref = metric_ref.stats()
        finally:
            utils.CifSeeds.set_threshold(saved_cpp[0])
            ref_cifcaf.set_keypoint_threshold(saved_cpp[1])
            ref_cifcaf.set_keypoint_threshold_rel(saved_cpp[2])
            utils.NMSKeypoints.set_instance_threshold(saved_cpp[3])
            utils.NMSKeypoints.set_keypoint_threshold(saved_cpp[4])
    finally:
        for k, v in saved.items():
            setattr(CocoKp, k, v)
        for k, v in saved_thr.items():
            setattr(CifCaf, k, v)

    # the pipelines decoded something (otherwise parity is vacuous)
    n_ref = sum(len(v) for v in preds_ref.values())
    n_ours = sum(len(v) for v in preds_ours.values())
    assert n_ref > 0, 'reference pipeline produced no detections'
    assert n_ours > 0, 'our pipeline produced no detections'

    # pose-level equality in original image coordinates
    for image_id, ref_anns in preds_ref.items():
        our_anns = preds_ours[image_id]
        assert len(our_anns) == len(ref_anns), \
            f'image {image_id}: {len(our_anns)} vs {len(ref_anns)} poses'
        for ra in ref_anns:
            dists = []
            for oa in our_anns:
                both = (ra.data[:, 2] > 0) & (oa.data[:, 2] > 0)
                if not np.any(both):
                    continue
                dists.append(float(np.abs(
                    ra.data[both, :2] - oa.data[both, :2]).max()))
            assert dists and min(dists) < 1e-2, \
                f'unmatched reference pose on image {image_id} ({dists})'

    # identical AP/AR stats through the same CocoEval
    np.testing.assert_allclose(stats_ours['stats'], stats_ref['stats'],
                               atol=1e-9)
