"""Camera shift augmentation (reference ``transforms/pair/camera_shift.py``):
shift the second frame to simulate camera motion."""

import copy

import numpy as np
import PIL.Image

from ..preprocess import Preprocess


class CameraShift(Preprocess):
    def __init__(self, max_shift=100):
        self.max_shift = max_shift

    def __call__(self, image, anns, meta):
        meta = copy.deepcopy(meta)
        anns = copy.deepcopy(anns)

        xy_shift = (np.random.rand(2) - 0.5) * 2 * self.max_shift
        xy_shift *= meta.get('group_i', 1.0)

        affine_params = (1.0, 0.0, xy_shift[0], 0.0, 1.0, xy_shift[1])
        image = image.transform(image.size, PIL.Image.Transform.AFFINE,
                                affine_params, fillcolor=(127, 127, 127))

        for ann in anns:
            ann['keypoints'][:, :2] += xy_shift
            ann['bbox'][:2] += xy_shift

        meta['offset'] += xy_shift
        meta['valid_area'][:2] += xy_shift
        return image, anns, meta
