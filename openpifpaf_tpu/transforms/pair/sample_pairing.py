"""SamplePairing augmentation for image groups.

Reference ``transforms/pair/sample_pairing.py``: blend each image of the
group 50/50 with the corresponding image of the *previous* sample and
concatenate both samples' annotations (Inoue 2018, arXiv:1801.02929,
adapted for pose estimation). Stateful across calls by design.
"""

import copy
import logging

import PIL.Image

from ..preprocess import Preprocess

LOG = logging.getLogger(__name__)


class SamplePairing(Preprocess):
    def __init__(self):
        self.previous_images = None
        self.previous_all_annotations = []

    def __call__(self, original_images, original_all_anns, metas):
        images = original_images
        all_anns = copy.deepcopy(original_all_anns)

        if self.previous_images is not None:
            images = [
                PIL.Image.blend(current_image, previous_image, 0.5)
                for current_image, previous_image
                in zip(images, self.previous_images)
            ]
            for current_anns, previous_anns in zip(
                    all_anns, self.previous_all_annotations):
                current_anns += previous_anns
            # meta untouched: predictions map back through the current
            # sample's geometry

        self.previous_images = original_images
        self.previous_all_annotations = original_all_anns
        return images, all_anns, metas
