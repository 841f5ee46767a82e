"""Rescaling transforms (reference ``transforms/scale.py:28-208``)."""

import copy
import logging

import numpy as np
import PIL.Image

from .preprocess import Preprocess

if not hasattr(PIL.Image, 'Resampling'):  # Pillow<9
    PIL.Image.Resampling = PIL.Image

LOG = logging.getLogger(__name__)


def _scale(image, anns, meta, target_w, target_h, resample=None):
    meta = copy.deepcopy(meta)
    anns = copy.deepcopy(anns)
    w, h = image.size

    if resample is None:
        resample = PIL.Image.Resampling.BILINEAR
    image = image.resize((target_w, target_h), resample)

    # keypoint coordinates are pixel-center based: scale by (n-1)/(N-1)
    x_scale = (image.size[0] - 1) / (w - 1)
    y_scale = (image.size[1] - 1) / (h - 1)
    scale_factors = np.array((x_scale, y_scale))
    for ann in anns:
        ann['keypoints'][:, [0, 1]] *= np.expand_dims(scale_factors, 0)
        ann['bbox'][:2] *= scale_factors
        ann['bbox'][2:] *= scale_factors

    meta['offset'] *= scale_factors
    meta['scale'] *= scale_factors
    meta['valid_area'][:2] *= scale_factors
    meta['valid_area'][2:] *= scale_factors

    return image, anns, meta


class RescaleRelative(Preprocess):
    """Rescale by a (sampled) factor relative to the input size."""

    def __init__(self, scale_range=(0.5, 1.0), *, resample=None,
                 absolute_reference=None, power_law=False, stretch_range=None,
                 fast=False):
        self.scale_range = scale_range
        self.resample = resample
        self.absolute_reference = absolute_reference
        self.power_law = power_law
        self.stretch_range = stretch_range
        self.fast = fast

    def __call__(self, image, anns, meta):
        if isinstance(self.scale_range, tuple):
            if self.power_law:
                log2_range = (np.log2(self.scale_range[0]),
                              np.log2(self.scale_range[1]))
                log2_factor = np.random.uniform(*log2_range)
                scale_factor = 2 ** log2_factor
            else:
                scale_factor = np.random.uniform(*self.scale_range)
        else:
            scale_factor = self.scale_range

        w, h = image.size
        if self.absolute_reference is not None:
            if w > h:
                h *= self.absolute_reference / w
                w = self.absolute_reference
            else:
                w *= self.absolute_reference / h
                h = self.absolute_reference

        stretch_factor = 1.0
        if self.stretch_range is not None:
            stretch_factor = np.random.uniform(*self.stretch_range)

        target_w = int(w * scale_factor * stretch_factor)
        target_h = int(h * scale_factor)
        return _scale(image, anns, meta, target_w, target_h, self.resample)


class RescaleAbsolute(Preprocess):
    """Rescale so the long edge has the given length."""

    def __init__(self, long_edge, *, fast=False, resample=None):
        self.long_edge = long_edge
        self.fast = fast
        self.resample = resample

    def __call__(self, image, anns, meta):
        w, h = image.size

        this_long_edge = self.long_edge
        if isinstance(this_long_edge, (tuple, list)):
            this_long_edge = int(np.random.randint(
                int(this_long_edge[0]), int(this_long_edge[1])))

        s = this_long_edge / max(h, w)
        if h > w:
            target_w, target_h = int(w * s), int(this_long_edge)
        else:
            target_w, target_h = int(this_long_edge), int(h * s)
        return _scale(image, anns, meta, target_w, target_h, self.resample)


class ScaleMix(Preprocess):
    """Push all-small scenes up and all-large scenes down by 2x
    (reference ``transforms/scale.py:176-208``)."""

    def __init__(self, scale_threshold, *, upscale_factor=2.0,
                 downscale_factor=0.5, resample=None):
        self.scale_threshold = scale_threshold
        self.upscale_factor = upscale_factor
        self.downscale_factor = downscale_factor
        self.resample = resample

    def __call__(self, image, anns, meta):
        scales = np.array([
            np.sqrt(ann['bbox'][2] * ann['bbox'][3])
            for ann in anns if (not ann.get('iscrowd', False)
                                and np.any(ann['keypoints'][:, 2] > 0.0))
        ])
        if not scales.shape[0]:
            return image, anns, meta

        all_above = np.all(scales > self.scale_threshold)
        all_below = np.all(scales < self.scale_threshold)
        if not all_above and not all_below:
            return image, anns, meta

        w, h = image.size
        if all_above:
            target_w, target_h = int(w * self.downscale_factor), \
                int(h * self.downscale_factor)
        else:
            target_w, target_h = int(w * self.upscale_factor), \
                int(h * self.upscale_factor)
        return _scale(image, anns, meta, target_w, target_h, self.resample)
