"""Golden-value tests for the self-written COCO evaluation.

``openpifpaf_tpu/metric/cocoeval.py`` reimplements the COCOeval protocol
(pycocotools is not in this environment); every case here asserts a
*hand-computed* expected value so the implementation is pinned to the
protocol itself (reference wrapper: metric/coco.py:38-163), not to its own
output.

Protocol facts used below:
- IoU/OKS thresholds: 10 values 0.50:0.05:0.95.
- AP is the 101-point interpolated average precision, averaged over
  thresholds; a single detection covering half the ground truths yields
  the classic 51/101 = 0.50495...
- Detections matched to ignored ground truths are neither TP nor FP.
- keypoints mode keeps max 20 detections per image (reference
  metric/coco.py / cocokp eval protocol).
"""

import numpy as np
import pytest

from openpifpaf_tpu.metric.cocoeval import (
    CocoEval, bbox_iou_xywh, compute_oks)

SIGMA = 0.1
SIGMAS1 = np.array([SIGMA])


def kp(x, y, v=2.0):
    return np.array([[x, y, v]], dtype=np.float64)


def gt(x, y, area=100.0, ignore=0, iscrowd=False):
    return {'keypoints': kp(x, y), 'bbox': [x - 5, y - 5, 10, 10],
            'area': area, 'ignore': ignore, 'iscrowd': iscrowd}


def det(x, y, score, area=100.0):
    return {'keypoints': kp(x, y), 'score': score, 'area': area}


def dx_for_oks(target_oks, area=100.0, sigma=SIGMA):
    """x-offset that produces exactly ``target_oks`` for one visible kp:
    oks = exp(-dx^2 / (2 * area * (2*sigma)^2))."""
    return float(np.sqrt(-np.log(target_oks) * 2.0 * area * (2 * sigma) ** 2))


def keypoint_stats(images, max_dets=20):
    ev = CocoEval(iou_type='keypoints', sigmas=SIGMAS1, max_dets=max_dets)
    for image_id, (dets, gts) in enumerate(images):
        ev.add_image(category_id=1, image_id=image_id, dets=dets, gts=gts)
    return ev.stats()


def test_oks_formula_golden():
    """One visible keypoint at distance d: oks = exp(-d^2/(2*area*(2s)^2))."""
    d = 3.0
    area = 100.0
    got = compute_oks(kp(13.0, 10.0)[:, :2].reshape(1, 2) * 1.0,
                      kp(10.0, 10.0), area, [5, 5, 10, 10], SIGMAS1)
    expected = np.exp(-(d ** 2) / ((2 * SIGMA) ** 2) / area / 2.0)
    np.testing.assert_allclose(got, expected, rtol=1e-12)


def test_oks_invisible_gt_uses_bbox_distance():
    """All-invisible gt keypoints: distances measured to the expanded
    bbox; a det inside the expanded box has zero distance -> oks 1."""
    gt_kps = np.array([[10.0, 10.0, 0.0]])
    got = compute_oks(np.array([[12.0, 12.0]]), gt_kps, 100.0,
                      [5.0, 5.0, 10.0, 10.0], SIGMAS1)
    np.testing.assert_allclose(got, 1.0, rtol=1e-12)


def test_bbox_iou_golden():
    # [0,0,10,10] vs [5,0,10,10]: inter 5*10=50, union 200-50=150
    np.testing.assert_allclose(
        bbox_iou_xywh([0, 0, 10, 10], [5, 0, 10, 10]), 50.0 / 150.0,
        rtol=1e-12)
    # crowd: union is the det area only -> 50/100
    np.testing.assert_allclose(
        bbox_iou_xywh([0, 0, 10, 10], [5, 0, 10, 10], iscrowd=True), 0.5,
        rtol=1e-12)


def test_exact_match_ap1():
    """Every gt detected exactly (OKS 1 matches all 10 thresholds)."""
    images = [([det(10, 10, 0.9), det(50, 50, 0.8)],
               [gt(10, 10), gt(50, 50)])]
    stats = keypoint_stats(images)
    np.testing.assert_allclose(stats[0], 1.0, atol=1e-9)   # AP
    np.testing.assert_allclose(stats[1], 1.0, atol=1e-9)   # AP50
    np.testing.assert_allclose(stats[2], 1.0, atol=1e-9)   # AP75
    np.testing.assert_allclose(stats[5], 1.0, atol=1e-9)   # AR


def test_known_oks_threshold_interpolation():
    """det at OKS 0.62: matches thresholds {0.50, 0.55, 0.60} only ->
    AP = 3/10, AP50 = 1, AP75 = 0, AR = 3/10."""
    d = dx_for_oks(0.62)
    images = [([det(10 + d, 10, 0.9)], [gt(10, 10)])]
    stats = keypoint_stats(images)
    np.testing.assert_allclose(stats[0], 0.3, atol=1e-6)
    np.testing.assert_allclose(stats[1], 1.0, atol=1e-6)
    np.testing.assert_allclose(stats[2], 0.0, atol=1e-6)
    np.testing.assert_allclose(stats[5], 0.3, atol=1e-6)


def test_half_recall_interpolated_ap():
    """2 gts, 1 exact det: precision 1 up to recall 0.5 -> the 101-point
    interpolation keeps precision 1 at the 51 recall points <= 0.5."""
    images = [([det(10, 10, 0.9)], [gt(10, 10), gt(50, 50)])]
    stats = keypoint_stats(images)
    np.testing.assert_allclose(stats[0], 51.0 / 101.0, atol=1e-9)
    np.testing.assert_allclose(stats[5], 0.5, atol=1e-9)  # AR


def test_false_positive_below_tp_score_keeps_ap1():
    """TP at score .9, far-away FP at score .8: precision at every
    achieved recall level is still 1 -> AP 1."""
    images = [([det(10, 10, 0.9), det(200, 200, 0.8)], [gt(10, 10)])]
    np.testing.assert_allclose(keypoint_stats(images)[0], 1.0, atol=1e-9)


def test_false_positive_above_tp_score_halves_ap():
    """FP outscores the TP: curve is (rc 0, pr 0) then (rc 1, pr 0.5);
    monotonic fix raises all precisions to 0.5 -> AP 0.5."""
    images = [([det(200, 200, 0.95), det(10, 10, 0.9)], [gt(10, 10)])]
    np.testing.assert_allclose(keypoint_stats(images)[0], 0.5, atol=1e-9)


def test_ignore_region_absorbs_detection():
    """A det matching only an ignored gt is neither TP nor FP; the real
    gt's exact det still gives AP 1."""
    images = [([det(10, 10, 0.9), det(50, 50, 0.8)],
               [gt(10, 10), gt(50, 50, ignore=1)])]
    stats = keypoint_stats(images)
    np.testing.assert_allclose(stats[0], 1.0, atol=1e-9)
    # and the ignored gt does not count towards recall's denominator
    np.testing.assert_allclose(stats[5], 1.0, atol=1e-9)


def test_real_match_preferred_over_ignore_match():
    """A det that matches an ignored gt at higher OKS but a real gt above
    threshold must count as TP for the real gt (ignore can't steal it)."""
    d = dx_for_oks(0.62)
    images = [([det(10 + d, 10, 0.9)],        # OKS .62 vs real gt
               [gt(10, 10), gt(10 + d, 10, ignore=1)])]  # OKS 1 vs ignore
    stats = keypoint_stats(images)
    # matched to the real gt at thresholds <= .6 -> AP 0.3 like above
    np.testing.assert_allclose(stats[0], 0.3, atol=1e-6)


def test_maxdets_truncation():
    """20 high-score FPs push the only TP past the cutoff: AP 0 at
    max_dets=20; with max_dets=30 the TP survives at precision 1/21."""
    fps = [det(200 + 7 * i, 200, 0.9 - 0.001 * i) for i in range(20)]
    tp = det(10, 10, 0.5)
    images = [(fps + [tp], [gt(10, 10)])]
    np.testing.assert_allclose(keypoint_stats(images, max_dets=20)[0], 0.0,
                               atol=1e-9)
    np.testing.assert_allclose(keypoint_stats(images, max_dets=30)[0],
                               1.0 / 21.0, atol=1e-9)


def test_area_range_buckets():
    """gt area 50^2 is 'medium': APM 1, APL has no valid gts (-1), and the
    large bucket must not create false positives from the unmatched det."""
    images = [([det(10, 10, 0.9, area=50.0 ** 2)],
               [gt(10, 10, area=50.0 ** 2)])]
    stats = keypoint_stats(images)
    np.testing.assert_allclose(stats[0], 1.0, atol=1e-9)   # AP all
    np.testing.assert_allclose(stats[3], 1.0, atol=1e-9)   # APM
    np.testing.assert_allclose(stats[4], -1.0, atol=1e-9)  # APL: no gts


def test_bbox_crowd_absorbs_extra_dets():
    """bbox mode: two dets inside an iscrowd ignore region are ignored
    (crowd union = det area -> IoU 1); the real gt's det gives AP 1."""
    ev = CocoEval(iou_type='bbox', max_dets=100)
    crowd = {'bbox': [100.0, 100.0, 50.0, 50.0], 'area': 2500.0,
             'ignore': 1, 'iscrowd': True}
    real = {'bbox': [0.0, 0.0, 10.0, 10.0], 'area': 100.0, 'ignore': 0,
            'iscrowd': False}
    dets = [
        {'bbox': [0.0, 0.0, 10.0, 10.0], 'score': 0.9, 'area': 100.0},
        {'bbox': [110.0, 110.0, 10.0, 10.0], 'score': 0.8, 'area': 100.0},
        {'bbox': [120.0, 120.0, 10.0, 10.0], 'score': 0.7, 'area': 100.0},
    ]
    ev.add_image(category_id=1, image_id=0, dets=dets, gts=[real, crowd])
    stats = ev.stats()
    np.testing.assert_allclose(stats[0], 1.0, atol=1e-9)


def test_bbox_categories_averaged():
    """bbox mode, two categories: cat 1 perfect (AP 1), cat 2 all missed
    (AP 0) -> overall AP is the category mean 0.5."""
    ev = CocoEval(iou_type='bbox', max_dets=100)
    box = {'bbox': [0.0, 0.0, 10.0, 10.0], 'area': 100.0, 'ignore': 0,
           'iscrowd': False}
    hit = {'bbox': [0.0, 0.0, 10.0, 10.0], 'score': 0.9, 'area': 100.0}
    miss = {'bbox': [500.0, 500.0, 10.0, 10.0], 'score': 0.9, 'area': 100.0}
    ev.add_image(category_id=1, image_id=0, dets=[hit], gts=[dict(box)])
    ev.add_image(category_id=2, image_id=0, dets=[miss], gts=[dict(box)])
    stats = ev.stats()
    np.testing.assert_allclose(stats[0], 0.5, atol=1e-9)


def test_score_tie_stable_order():
    """Equal scores: mergesort keeps insertion order, so the TP inserted
    before an equal-score FP keeps AP 1 (regression guard for the sort)."""
    images = [([det(10, 10, 0.9), det(200, 200, 0.9)], [gt(10, 10)])]
    np.testing.assert_allclose(keypoint_stats(images)[0], 1.0, atol=1e-9)
