"""Capture golden outputs for the transforms package.

Runs every transform over seeded synthetic scenes (images as PIL, COCO
annotation dicts, metas) and stores the resulting image pixels, keypoint /
bbox arrays, and meta fields in ``tests/golden/transform_golden.npz``.
``tests/test_transform_golden.py`` asserts bit-identical behavior, pinning
transform semantics (incl. the exact np.random consumption order) across
rewrites (reference behavior: ``transforms/*.py``, ``transforms/pair/*.py``).
"""

import os
import sys
import zlib

import numpy as np
import PIL.Image

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                '..'))

from openpifpaf_tpu import transforms  # noqa: E402
from openpifpaf_tpu.plugins.coco import constants  # noqa: E402


def make_image(w, h, seed):
    rng = np.random.RandomState(seed)
    return PIL.Image.fromarray(
        rng.randint(0, 255, size=(h, w, 3), dtype=np.uint8))


def make_anns(seed, n=3, w=400, h=300):
    rng = np.random.RandomState(seed)
    anns = []
    for i in range(n):
        kps = np.zeros((17, 3), dtype=np.float32)
        cx, cy = rng.uniform(50, w - 50), rng.uniform(50, h - 50)
        kps[:, 0] = cx + rng.uniform(-40, 40, 17)
        kps[:, 1] = cy + rng.uniform(-60, 60, 17)
        kps[:, 2] = rng.choice([0.0, 1.0, 2.0], 17, p=[0.2, 0.2, 0.6])
        vis = kps[:, 2] > 0
        if not np.any(vis):
            kps[0, 2] = 2.0
            vis = kps[:, 2] > 0
        bbox = np.array([kps[vis, 0].min(), kps[vis, 1].min(),
                         np.ptp(kps[vis, 0]) + 2, np.ptp(kps[vis, 1]) + 2],
                        dtype=np.float32)
        anns.append({
            'keypoints': kps, 'bbox': bbox, 'iscrowd': i == n - 1,
            'category_id': 1,
            'bbox_original': bbox.copy() * 1.5,
            'segmentation': None,
        })
    return anns


def make_meta(w=400, h=300):
    return {
        'dataset_index': 0,
        'image_id': 123,
        'file_name': 'synthetic.jpg',
        'offset': np.array([0.0, 0.0]),
        'scale': np.array([1.0, 1.0]),
        'rotation': {'angle': 0.0, 'width': None, 'height': None},
        'valid_area': np.array([0.0, 0.0, w - 1.0, h - 1.0]),
        'hflip': False,
        'width_height': np.array([w, h]),
    }


def snapshot(prefix, image, anns, meta, out):
    if isinstance(image, PIL.Image.Image):
        out[f'{prefix}__image'] = np.asarray(image)
    for i, ann in enumerate(anns):
        if not isinstance(ann, (dict, np.ndarray)):  # Annotation object
            out[f'{prefix}__ann{i}_cls'] = np.frombuffer(
                type(ann).__name__.encode(), dtype=np.uint8)
            out[f'{prefix}__ann{i}_cat'] = np.asarray(ann.category_id or 0)
            if getattr(ann, 'data', None) is not None:
                out[f'{prefix}__ann{i}_data'] = np.asarray(ann.data)
            if getattr(ann, 'bbox', None) is not None and \
                    not callable(ann.bbox):
                out[f'{prefix}__ann{i}_abox'] = np.asarray(ann.bbox,
                                                           dtype=np.float64)
            continue
        if isinstance(ann, np.ndarray):  # encoded target
            out[f'{prefix}__target{i}'] = ann
            continue
        out[f'{prefix}__ann{i}_kps'] = ann['keypoints']
        out[f'{prefix}__ann{i}_bbox'] = np.asarray(ann['bbox'],
                                                   dtype=np.float64)
        out[f'{prefix}__ann{i}_crowd'] = np.asarray(ann['iscrowd'])
    if meta is not None:
        out[f'{prefix}__valid_area'] = np.asarray(meta['valid_area'],
                                                  dtype=np.float64)
        out[f'{prefix}__offset'] = np.asarray(meta['offset'],
                                              dtype=np.float64)
        if 'rotation' in meta:
            out[f'{prefix}__angle'] = np.asarray(
                meta['rotation']['angle'], dtype=np.float64)


def snapshot_group(prefix, images, anns_groups, metas, out):
    for gi, (im, anns) in enumerate(zip(images, anns_groups)):
        meta = metas[gi] if isinstance(metas, (list, tuple)) else None
        snapshot(f'{prefix}_g{gi}', im, anns, meta, out)
    if isinstance(metas, dict):
        out[f'{prefix}__meta0_valid_area'] = np.asarray(
            metas['valid_area'], dtype=np.float64)


def single_image_cases():
    t = transforms
    hf = t.HFlip(constants.COCO_KEYPOINTS, constants.HFLIP)
    return {
        'crop_small': t.Crop(97),
        'crop_large': t.Crop(513),
        'crop_noaoi': t.Crop(129, use_area_of_interest=False),
        'hflip': hf,
        'minsize': t.MinSize(min_side=60.0),
        'unclipped_sides': t.UnclippedSides(margin=40,
                                            clipped_sides_okay=1),
        'unclipped_area': t.UnclippedArea(threshold=0.8),
        'rot90': t.RotateBy90(fixed_angle=90.0),
        'rot180': t.RotateBy90(fixed_angle=180.0),
        'rot270_prepad': t.RotateBy90(fixed_angle=270.0, prepad=True),
        'rot_random': t.RotateBy90(angle_perturbation=10.0, prepad=True),
        'rot_uniform': t.RotateUniform(max_angle=25.0),
        'rescale_rel': t.RescaleRelative((0.6, 1.2)),
        'rescale_rel_power': t.RescaleRelative((0.5, 2.0), power_law=True,
                                               stretch_range=(0.9, 1.1)),
        'rescale_abs': t.RescaleAbsolute(161),
        'rescale_abs_range': t.RescaleAbsolute((120, 200)),
        'scalemix_up': t.ScaleMix(200.0),
        'scalemix_down': t.ScaleMix(20.0),
        'random_apply': t.RandomApply(hf, 0.5),
        'random_choice': t.RandomChoice([hf, t.MinSize(30.0)], [0.3, 0.3]),
        'det_choice': t.DeterministicEqualChoice([hf, None], salt=1),
        'compose': t.Compose([t.RescaleAbsolute(181), None, hf]),
        'to_annotations_kp': t.ToAnnotations([
            t.ToKpAnnotations(
                constants.COCO_CATEGORIES,
                keypoints_by_category={1: constants.COCO_KEYPOINTS},
                skeleton_by_category={1: constants.COCO_PERSON_SKELETON}),
            t.ToCrowdAnnotations(constants.COCO_CATEGORIES),
        ]),
        'to_annotations_det': t.ToAnnotations([
            t.ToDetAnnotations(constants.COCO_CATEGORIES),
            t.ToCrowdAnnotations(constants.COCO_CATEGORIES),
        ]),
    }


def pair_cases():
    t = transforms
    hf = t.HFlip(constants.COCO_KEYPOINTS, constants.HFLIP)
    return {
        'pair_single_image': t.pair.SingleImage(t.Compose([
            t.RescaleRelative((0.7, 1.1)), hf])),
        'pair_camera_shift': t.pair.SingleImage(
            t.pair.CameraShift(max_shift=30)),
        'pair_crop': t.pair.Crop(97, max_shift=20),
        'pair_blank_past': t.pair.BlankPast(),
        'pair_sample_pairing': t.pair.SamplePairing(),
        'pair_randomize_one': t.pair.RandomizeOneFrame(),
        'pair_previous_past': t.pair.PreviousPast(),
    }


def main():
    out = {}

    for name, tf in sorted(single_image_cases().items()):
        np.random.seed(zlib.crc32(name.encode()) % (2 ** 31))
        image = make_image(400, 300, 1)
        anns = make_anns(2)
        meta = make_meta()
        im2, anns2, meta2 = tf(image, anns, meta)
        snapshot(name, im2, anns2,
                 meta2 if isinstance(meta2, dict) else None, out)
        # second call on a square image (different code paths e.g. rot90)
        image = make_image(256, 256, 3)
        anns = make_anns(5, w=256, h=256)
        meta = make_meta(256, 256)
        im3, anns3, meta3 = tf(image, anns, meta)
        snapshot(name + '_sq', im3, anns3,
                 meta3 if isinstance(meta3, dict) else None, out)

    for name, tf in sorted(pair_cases().items()):
        np.random.seed(zlib.crc32(name.encode()) % (2 ** 31))
        # build the pair from a still image like the cocokpst pipeline
        pair_maker = transforms.pair.ImageToTracking()
        images, all_anns, metas = pair_maker(
            make_image(400, 300, 2), make_anns(4), make_meta())
        # stateful transforms: run twice so previous-sample caching is
        # exercised
        for round_i in range(2):
            images2, all_anns2, metas2 = tf(images, all_anns, metas)
        snapshot_group(name, images2, all_anns2, metas2, out)

    # pair Encoders end-to-end via ImageToTracking (targets)
    np.random.seed(11)
    from openpifpaf_tpu import encoder, headmeta
    tcaf_meta = headmeta.Tcaf(
        'tcaf', 'test',
        keypoints_single_frame=constants.COCO_KEYPOINTS,
        sigmas_single_frame=constants.COCO_PERSON_SIGMAS,
        pose_single_frame=constants.COCO_UPRIGHT_POSE,
        draw_skeleton_single_frame=constants.COCO_PERSON_SKELETON)
    tcaf_meta.base_stride = 8
    tcaf_meta.head_index = 0
    enc_tf = transforms.pair.Encoders([encoder.Tcaf(tcaf_meta)])
    images, all_anns, metas = transforms.pair.ImageToTracking()(
        make_image(240, 200, 5), make_anns(3, w=240, h=200),
        make_meta(240, 200))
    images = [np.asarray(im, dtype=np.float32) / 255.0 for im in images]
    _, targets, meta0 = enc_tf(images, all_anns, metas)
    out['pair_encoders__target0'] = targets[0]

    golden_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              '..', 'tests', 'golden')
    os.makedirs(golden_dir, exist_ok=True)
    path = os.path.join(golden_dir, 'transform_golden.npz')
    np.savez_compressed(path, **out)
    print(f'wrote {path} with {len(out)} arrays')


if __name__ == '__main__':
    main()
