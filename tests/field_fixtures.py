"""Synthetic decoded-field fixtures for decoder tests.

Builds consistent CIF/CAF fields from ground-truth poses by running the
target encoders and converting targets to the decoded-field layout
(absolute coordinates, confidences in [0, 1]).
"""

import numpy as np

from openpifpaf_tpu import encoder, headmeta
from openpifpaf_tpu.plugins.coco import constants


def make_metas(stride=8):
    cif = headmeta.Cif('cif', 'test',
                       keypoints=constants.COCO_KEYPOINTS,
                       sigmas=constants.COCO_PERSON_SIGMAS,
                       pose=constants.COCO_UPRIGHT_POSE,
                       score_weights=constants.COCO_PERSON_SCORE_WEIGHTS)
    caf = headmeta.Caf('caf', 'test',
                       keypoints=constants.COCO_KEYPOINTS,
                       sigmas=constants.COCO_PERSON_SIGMAS,
                       pose=constants.COCO_UPRIGHT_POSE,
                       skeleton=constants.COCO_PERSON_SKELETON)
    cif.head_index = 0
    caf.head_index = 1
    cif.base_stride = stride
    caf.base_stride = stride
    return cif, caf


def synthetic_person(cx, cy, height, rng=None, pose=None):
    """Keypoints for an upright person centered at (cx, cy).

    pose: (n_kp, 3) canonical upright pose (default COCO's 17-keypoint
    pose); any meta's ``pose`` constant works, e.g. wholebody's 133.
    """
    if pose is None:
        pose = constants.COCO_UPRIGHT_POSE.copy()
        y_half, y_span = 9.7 / 2, 9.7
    else:
        pose = np.asarray(pose, dtype=np.float32).copy()
        y_min, y_max = pose[:, 1].min(), pose[:, 1].max()
        y_half, y_span = (y_min + y_max) / 2, y_max - y_min
    scale_f = height / y_span
    n_kp = pose.shape[0]
    kps = np.zeros((n_kp, 3), dtype=np.float32)
    kps[:, 0] = cx + pose[:, 0] * scale_f
    kps[:, 1] = cy + (y_half - pose[:, 1]) * scale_f
    kps[:, 2] = 2.0
    if rng is not None:
        kps[:, :2] += rng.uniform(-1.0, 1.0, size=(n_kp, 2))
    return kps


def fields_from_annotations(anns, image_hw, stride=8, metas=None):
    """Encode annotations and convert targets to decoded-field layout.

    Returns (cif_field (F,5,H,W), caf_field (E,8,H,W)) ready for the
    decoder, plus the metas. ``metas`` defaults to the COCO-17 test metas;
    pass any (Cif, Caf) pair (e.g. a datamodule's) for other skeletons.
    """
    cif_meta, caf_meta = make_metas(stride) if metas is None else metas
    image = np.zeros((image_hw[0], image_hw[1], 3), dtype=np.float32)
    meta = {}

    cif_t = encoder.Cif(cif_meta)(image, anns, meta)
    caf_t = encoder.Caf(caf_meta)(image, anns, meta)

    # cif target: [c, dx, dy, bmin, scale] (relative regressions)
    n_f, _, h, w = cif_t.shape
    ix = np.arange(w, dtype=np.float32)[None, None, :]
    iy = np.arange(h, dtype=np.float32)[None, :, None]
    cif_field = np.zeros((n_f, 5, h, w), dtype=np.float32)
    cif_field[:, 1] = np.nan_to_num(cif_t[:, 0], nan=0.0)
    cif_field[:, 2] = np.nan_to_num(cif_t[:, 1]) + ix
    cif_field[:, 3] = np.nan_to_num(cif_t[:, 2]) + iy
    cif_field[:, 4] = np.nan_to_num(cif_t[:, 4], nan=0.0)

    n_e = caf_t.shape[0]
    caf_field = np.zeros((n_e, 8, h, w), dtype=np.float32)
    caf_field[:, 1] = np.nan_to_num(caf_t[:, 0], nan=0.0)
    caf_field[:, 2] = np.nan_to_num(caf_t[:, 1]) + ix
    caf_field[:, 3] = np.nan_to_num(caf_t[:, 2]) + iy
    caf_field[:, 4] = np.nan_to_num(caf_t[:, 3]) + ix
    caf_field[:, 5] = np.nan_to_num(caf_t[:, 4]) + iy
    caf_field[:, 6] = np.nan_to_num(caf_t[:, 7], nan=0.0)
    caf_field[:, 7] = np.nan_to_num(caf_t[:, 8], nan=0.0)

    return cif_field, caf_field, (cif_meta, caf_meta)


def annotation_dict(kps):
    xs = kps[kps[:, 2] > 0, 0]
    ys = kps[kps[:, 2] > 0, 1]
    bbox = np.array([xs.min(), ys.min(),
                     xs.max() - xs.min(), ys.max() - ys.min()],
                    dtype=np.float32)
    return {'keypoints': kps.copy(), 'bbox': bbox, 'iscrowd': False}
