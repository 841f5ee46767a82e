"""Capture golden target tensors from the encoder package.

Runs every encoder (Cif, Caf incl. dense-skeleton veto, CifDet, Tcaf) over a
battery of adversarial scenes — overlapping people, crowd regions,
keypointless instances, hidden keypoints, out-of-bounds joints, valid-area
masking, tracking pairs — and stores the produced target tensors in
``tests/golden/encoder_golden.npz``. ``tests/test_encoder_golden.py``
asserts bit-identical outputs, pinning encoder semantics across rewrites
(reference behavior: ``encoder/cif.py:16-151``, ``encoder/caf.py:16-311``,
``encoder/cifdet.py``, ``encoder/tcaf.py:13-43``).
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                '..'))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                '..', 'tests'))

import field_fixtures  # noqa: E402
from openpifpaf_tpu import encoder, headmeta  # noqa: E402
from openpifpaf_tpu.plugins.coco import constants  # noqa: E402


def person(cx, cy, height, rng, v=2.0):
    kps = field_fixtures.synthetic_person(cx, cy, height, rng)
    kps[:, 2] = v
    return kps


def ann(kps, iscrowd=False, track_id=None, bbox=None):
    if bbox is None:
        vis = kps[:, 2] > 0
        if np.any(vis):
            xs, ys = kps[vis, 0], kps[vis, 1]
            bbox = np.array([xs.min(), ys.min(), xs.max() - xs.min(),
                             ys.max() - ys.min()], dtype=np.float32)
        else:
            bbox = np.array([0.0, 0.0, 1.0, 1.0], dtype=np.float32)
    return {'keypoints': kps, 'bbox': bbox, 'iscrowd': iscrowd,
            **({'track_id': track_id} if track_id is not None else {})}


def scenes():
    rng = np.random.RandomState(42)
    image_hw = (241, 321)

    # 1: two heavily overlapping people + crowd box + keypointless instance
    p1 = person(120, 100, 140, rng)
    p2 = person(140, 110, 150, rng)
    p2[3:8, 2] = 1.0  # hidden keypoints near p1's visible ones
    empty = np.zeros((17, 3), dtype=np.float32)
    crowd_kps = np.zeros((17, 3), dtype=np.float32)
    anns1 = [ann(p1), ann(p2),
             ann(empty, bbox=np.array([10., 10., 40., 40.],
                                      dtype=np.float32)),
             ann(crowd_kps, iscrowd=True,
                 bbox=np.array([200., 150., 80., 60.], dtype=np.float32))]
    meta1 = {'valid_area': np.array([8.0, 8.0, 300.0, 220.0])}

    # 2: person straddling the image border (out-of-bounds joints)
    p3 = person(10, 20, 120, rng)
    p4 = person(310, 230, 160, rng)
    anns2 = [ann(p3), ann(p4)]
    meta2 = {}

    # 3: degenerate instances: two visible keypoints (scale -> nan),
    # tiny person (scale < 0.1), all-hidden person
    p5 = person(160, 120, 100, rng)
    p5[:, 2] = 0.0
    p5[0, 2] = 2.0
    p5[5, 2] = 2.0
    p6 = person(200, 60, 0.5, rng)
    p7 = person(80, 180, 110, rng, v=1.0)
    anns3 = [ann(p5), ann(p6), ann(p7)]
    meta3 = {'valid_area': np.array([0.0, 0.0, 321.0, 241.0])}

    return image_hw, [(anns1, meta1), (anns2, meta2), (anns3, meta3)]


def main():
    out = {}
    image_hw, scene_list = scenes()
    image = np.zeros((image_hw[0], image_hw[1], 3), dtype=np.float32)

    cif_meta, caf_meta = field_fixtures.make_metas(stride=8)
    dense_meta = headmeta.Caf(
        'caf25', 'test',
        keypoints=constants.COCO_KEYPOINTS,
        sigmas=constants.COCO_PERSON_SIGMAS,
        pose=constants.COCO_UPRIGHT_POSE,
        skeleton=constants.DENSER_COCO_PERSON_SKELETON,
        sparse_skeleton=constants.COCO_PERSON_SKELETON,
        only_in_field_of_view=True)
    dense_meta.base_stride = 8

    for si, (anns, meta) in enumerate(scene_list):
        anns_copy = [dict(a, keypoints=a['keypoints'].copy()) for a in anns]
        out[f'cif_{si}'] = encoder.Cif(cif_meta)(image, anns_copy, meta)
        anns_copy = [dict(a, keypoints=a['keypoints'].copy()) for a in anns]
        out[f'caf_{si}'] = encoder.Caf(caf_meta)(image, anns_copy, meta)
        anns_copy = [dict(a, keypoints=a['keypoints'].copy()) for a in anns]
        out[f'cafdense_{si}'] = encoder.Caf(dense_meta)(image, anns_copy,
                                                        meta)

    # Caf config variants on scene 0
    anns, meta = scene_list[0]
    for name, attrs in [('fixed', {'fixed_size': True}),
                        ('aspect', {'aspect_ratio': 0.3}),
                        ('minsz5', {'min_size': 5})]:
        old = {k: getattr(encoder.Caf, k) for k in attrs}
        for k, v in attrs.items():
            setattr(encoder.Caf, k, v)
        try:
            anns_copy = [dict(a, keypoints=a['keypoints'].copy())
                         for a in anns]
            out[f'caf_variant_{name}'] = encoder.Caf(caf_meta)(
                image, anns_copy, meta)
        finally:
            for k, v in old.items():
                setattr(encoder.Caf, k, v)

    # rescaler-flag variants on scene 0 (cif targets)
    for name, attrs in [
            ('collision', {'suppress_collision': True}),
            ('invisible', {'suppress_invisible': True}),
            ('noselfhidden', {'suppress_selfhidden': False})]:
        old = {k: getattr(encoder.AnnRescaler, k) for k in attrs}
        for k, v in attrs.items():
            setattr(encoder.AnnRescaler, k, v)
        try:
            anns_copy = [dict(a, keypoints=a['keypoints'].copy())
                         for a in anns]
            out[f'cif_rescaler_{name}'] = encoder.Cif(cif_meta)(
                image, anns_copy, meta)
        finally:
            for k, v in old.items():
                setattr(encoder.AnnRescaler, k, v)

    # CifDet over boxes (incl. a crowd box)
    det_meta = headmeta.CifDet('cifdet', 'test',
                               categories=['a', 'b', 'c'])
    det_meta.base_stride = 16
    det_anns = [
        {'category_id': 1, 'bbox': np.array([30., 40., 80., 60.]),
         'iscrowd': False},
        {'category_id': 2, 'bbox': np.array([100., 90., 120., 100.]),
         'iscrowd': False},
        {'category_id': 1, 'bbox': np.array([90., 50., 70., 90.]),
         'iscrowd': False},
        {'category_id': 3, 'bbox': np.array([200., 10., 60., 40.]),
         'iscrowd': True},
    ]
    det_image = np.zeros((241, 321, 3), dtype=np.float32)
    out['cifdet_0'] = encoder.CifDet(det_meta)(
        det_image, det_anns, {'valid_area': np.array([4., 4., 310., 230.])})

    # Tcaf over a tracking pair
    tcaf_meta = headmeta.Tcaf(
        'tcaf', 'test',
        keypoints_single_frame=constants.COCO_KEYPOINTS,
        sigmas_single_frame=constants.COCO_PERSON_SIGMAS,
        pose_single_frame=constants.COCO_UPRIGHT_POSE,
        draw_skeleton_single_frame=constants.COCO_PERSON_SKELETON)
    tcaf_meta.base_stride = 8
    rng = np.random.RandomState(7)
    q1 = person(120, 100, 140, rng)
    q2 = person(220, 120, 130, rng)
    q1b = q1.copy()
    q1b[:, 0] += 6.0
    q2b = q2.copy()
    q2b[:, 1] += 4.0
    q2b[5:9, 2] = 0.0
    frame1 = [ann(q1, track_id=1), ann(q2, track_id=2),
              ann(np.zeros((17, 3), dtype=np.float32), iscrowd=True,
                  bbox=np.array([5., 5., 50., 30.], dtype=np.float32))]
    frame2 = [ann(q1b, track_id=1), ann(q2b, track_id=2)]
    out['tcaf_0'] = encoder.Tcaf(tcaf_meta)(
        [image, image], (frame1, frame2), {})

    golden_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              '..', 'tests', 'golden')
    os.makedirs(golden_dir, exist_ok=True)
    path = os.path.join(golden_dir, 'encoder_golden.npz')
    np.savez_compressed(path, **out)
    print(f'wrote {path}: ' + ', '.join(
        f'{k}{v.shape}' for k, v in sorted(out.items())))


if __name__ == '__main__':
    main()
