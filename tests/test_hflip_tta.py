"""Horizontal-flip TTA: field mapback correctness.

A perfectly equivariant network's output for the mirrored image is the
analytic mirror of its direct output (left/right fields swapped, W axis
reversed, x regressions reflected). The Predictor's TTA mapback must turn
that mirrored output back into the direct fields, so averaging is a no-op
and the decode is unchanged.
"""

import os
import sys

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import field_fixtures  # noqa: E402

import openpifpaf_tpu  # noqa: E402
from openpifpaf_tpu.models.heads import pif_hflip, paf_hflip  # noqa: E402
from openpifpaf_tpu.predictor import Predictor  # noqa: E402


def _mirrored_annotation(kps, image_w, keypoints, hflip):
    """The annotation as it appears in the horizontally mirrored image."""
    out = kps.copy()
    out[:, 0] = (image_w - 1) - kps[:, 0]
    # swap left/right keypoint rows
    idx = [keypoints.index(hflip.get(k, k)) for k in keypoints]
    return out[idx]


def test_mapback_inverts_analytic_mirror():
    datamodule = openpifpaf_tpu.datasets.factory('cocokp')
    cif_meta, caf_meta = datamodule.head_metas
    keypoints = list(cif_meta.keypoints)
    hflip = Predictor._hflip_mapping(keypoints)
    assert hflip['left_wrist'] == 'right_wrist'

    stride = 8
    hw = (129, 161)
    rng = np.random.RandomState(0)
    kps = field_fixtures.synthetic_person(70.0, 60.0, 80.0, rng)
    cif, caf, _ = field_fixtures.fields_from_annotations(
        [field_fixtures.annotation_dict(kps)], hw, stride=stride)

    kps_m = _mirrored_annotation(kps, hw[1], keypoints, hflip)
    cif_m, caf_m, _ = field_fixtures.fields_from_annotations(
        [field_fixtures.annotation_dict(kps_m)], hw, stride=stride)

    w_cells = cif.shape[-1]

    back_cif = np.array(
        pif_hflip(jnp.asarray(cif_m[None]), keypoints, hflip))
    back_cif[:, :, 2] += w_cells - 1.0
    # compare where either side has confidence (NaN-free intersection)
    conf = (cif[None, :, 1] > 0) & (back_cif[:, :, 1] > 0)
    np.testing.assert_allclose(back_cif[:, :, 1][conf],
                               cif[None, :, 1][conf], atol=1e-5)
    for ch in (2, 3, 4):
        np.testing.assert_allclose(back_cif[:, :, ch][conf],
                                   cif[None, :, ch][conf], atol=1e-3)

    back_caf = np.array(paf_hflip(
        jnp.asarray(caf_m[None]), keypoints, list(caf_meta.skeleton), hflip))
    back_caf[:, :, 2] += w_cells - 1.0
    back_caf[:, :, 4] += w_cells - 1.0
    conf = (caf[None, :, 1] > 0) & (back_caf[:, :, 1] > 0)
    np.testing.assert_allclose(back_caf[:, :, 1][conf],
                               caf[None, :, 1][conf], atol=1e-5)
    for ch in (2, 3, 4, 5):
        np.testing.assert_allclose(back_caf[:, :, ch][conf],
                                   caf[None, :, ch][conf], atol=1e-3)


def test_tta_decode_unchanged_for_equivariant_fields():
    """Averaging direct fields with the mapped-back mirror of themselves
    leaves the decode result unchanged."""
    from openpifpaf_tpu.ops import build_cifcaf_decoder

    datamodule = openpifpaf_tpu.datasets.factory('cocokp')
    cif_meta, caf_meta = datamodule.head_metas
    keypoints = list(cif_meta.keypoints)
    hflip = Predictor._hflip_mapping(keypoints)

    stride = 8
    hw = (129, 161)
    rng = np.random.RandomState(1)
    kps = field_fixtures.synthetic_person(80.0, 64.0, 90.0, rng)
    cif, caf, _ = field_fixtures.fields_from_annotations(
        [field_fixtures.annotation_dict(kps)], hw, stride=stride)
    kps_m = _mirrored_annotation(kps, hw[1], keypoints, hflip)
    cif_m, caf_m, _ = field_fixtures.fields_from_annotations(
        [field_fixtures.annotation_dict(kps_m)], hw, stride=stride)

    w_cells = cif.shape[-1]
    back_cif = np.array(pif_hflip(jnp.asarray(cif_m[None]), keypoints,
                                  hflip))[0]
    back_cif[:, 2] += w_cells - 1.0
    back_caf = np.array(paf_hflip(jnp.asarray(caf_m[None]), keypoints,
                                  list(caf_meta.skeleton), hflip))[0]
    back_caf[:, 2] += w_cells - 1.0
    back_caf[:, 4] += w_cells - 1.0

    avg_cif = 0.5 * (cif + back_cif)
    avg_caf = 0.5 * (caf + back_caf)

    decoder = build_cifcaf_decoder(stride=stride,
                                   skeleton=caf_meta.skeleton,
                                   n_keypoints=len(keypoints))
    poses_a, keep_a, _ = (np.asarray(v) for v in decoder(cif[None], caf[None]))
    poses_b, keep_b, _ = (np.asarray(v) for v in
                          decoder(avg_cif[None], avg_caf[None]))
    pa = poses_a[0][keep_a[0] > 0]
    pb = poses_b[0][keep_b[0] > 0]
    assert len(pa) == len(pb) == 1
    vis = (pa[0][:, 0] > 0) & (pb[0][:, 0] > 0)
    np.testing.assert_allclose(pb[0][vis, 1:3], pa[0][vis, 1:3], atol=0.6)


def test_multiscale_oks_merge():
    """OKS-greedy merge keeps the best-scoring duplicate and distinct
    poses."""
    from openpifpaf_tpu.annotation import Annotation

    datamodule = openpifpaf_tpu.datasets.factory('cocokp')
    cif_meta, caf_meta = datamodule.head_metas
    keypoints = list(cif_meta.keypoints)
    rng = np.random.RandomState(0)
    kps = field_fixtures.synthetic_person(80.0, 64.0, 90.0, rng)

    def make_ann(offset, conf):
        ann = Annotation(keypoints, list(caf_meta.skeleton))
        ann.data[:, 0] = kps[:, 0] + offset
        ann.data[:, 1] = kps[:, 1]
        ann.data[:, 2] = conf
        return ann

    dup_a = make_ann(0.0, 0.9)
    dup_b = make_ann(0.8, 0.7)   # near-duplicate from another scale
    distinct = make_ann(120.0, 0.8)

    p = Predictor.__new__(Predictor)  # merge logic only
    p.head_metas = [cif_meta, caf_meta]
    merged = p._merge_annotations([dup_b, distinct, dup_a])
    assert len(merged) == 2
    scores = sorted(round(a.score, 2) for a in merged)
    assert scores == [0.8, 0.9]  # the 0.7 duplicate was suppressed
