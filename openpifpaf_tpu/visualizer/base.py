"""Visualizer base (reference ``visualizer/base.py:25-166``)."""

import logging

import numpy as np

LOG = logging.getLogger(__name__)


class Base:
    all_indices = []
    common_ax = None
    processed_image_intensity_spread = 2.0

    _image = None
    _processed_image = None
    _image_meta = None
    _ground_truth = None

    def __init__(self, head_name):
        self.head_name = head_name
        self._ax = None

    @classmethod
    def image(cls, image=None, meta=None):
        if image is None:
            cls._image = None
            cls._image_meta = None
            return cls
        cls._image = np.asarray(image)
        cls._image_meta = meta
        return cls

    @classmethod
    def processed_image(cls, image=None):
        if image is None:
            cls._processed_image = None
            return cls
        image = np.moveaxis(np.asarray(image), 0, -1) \
            if np.asarray(image).shape[0] in (1, 3) else np.asarray(image)
        image = 0.5 + 0.5 * image / cls.processed_image_intensity_spread
        cls._processed_image = np.clip(image, 0.0, 1.0)
        return cls

    @classmethod
    def ground_truth(cls, ground_truth):
        cls._ground_truth = ground_truth
        return cls

    @classmethod
    def reset(cls):
        cls._image = None
        cls._image_meta = None
        cls._processed_image = None
        cls._ground_truth = None

    @property
    def indices(self):
        return [f for hn, f in self.all_indices if hn == self.head_name]

    def targets(self, field, *, annotation_dicts=None):
        """Visualize encoded targets. No-op unless indices are requested."""

    def predicted(self, field):
        """Visualize predicted fields. No-op unless indices are requested."""
