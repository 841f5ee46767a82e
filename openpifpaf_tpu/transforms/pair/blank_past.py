"""Past-frame replacement augmentations
(reference ``transforms/pair/blank_past.py``)."""

import copy

import numpy as np
import PIL.Image

from ..preprocess import Preprocess


class BlankPast(Preprocess):
    def __call__(self, images, all_anns, metas):
        images = list(images)
        all_anns = copy.deepcopy(all_anns)
        metas = copy.deepcopy(metas)

        for i, _ in enumerate(images[1:], start=1):
            images[i] = PIL.Image.new('RGB', (320, 240), (127, 127, 127))
        for i, _ in enumerate(all_anns[1:], start=1):
            all_anns[i] = []
        for meta in metas[1:]:
            meta['image'] = {'frame_id': -1, 'file_name': 'blank'}
        return images, all_anns, metas


class PreviousPast(Preprocess):
    def __init__(self):
        self.previous_image = PIL.Image.new('RGB', (320, 240), (127, 127, 127))
        self.previous_meta = {'frame_id': -1, 'file_name': 'blank'}
        self.previous_annotations = []

    def __call__(self, images, all_anns, metas):
        images = list(images)
        all_anns = copy.deepcopy(all_anns)
        metas = copy.deepcopy(metas)

        for i, _ in enumerate(images[1:], start=1):
            images[i] = self.previous_image
        for i, _ in enumerate(all_anns[1:], start=1):
            all_anns[i] = []
        for meta in metas[1:]:
            meta['image'] = self.previous_meta

        self.previous_image = images[0]
        self.previous_annotations = all_anns[0]
        self.previous_meta = metas[0]
        return images, all_anns, metas


class RandomizeOneFrame(Preprocess):
    """Replace one frame of the pair with a cached frame from another
    sample (negative pairs for association training)."""

    def __init__(self):
        self.previous_image = None
        self.previous_meta = None
        self.previous_annotations = []

    def __call__(self, images, all_anns, metas):
        images = list(images)
        all_anns = copy.deepcopy(all_anns)
        metas = copy.deepcopy(metas)

        replace_index = int(np.random.randint(0, len(metas)))

        if self.previous_image is not None:
            images[replace_index] = self.previous_image
            all_anns[replace_index] = self.previous_annotations
            for ann in all_anns[replace_index]:
                ann['track_id'] = ann.get('track_id', 0) + 10000
            metas[replace_index] = self.previous_meta

        not_replaced_index = 0 if replace_index != 0 else 1
        self.previous_image = copy.deepcopy(images[not_replaced_index])
        self.previous_annotations = copy.deepcopy(all_anns[not_replaced_index])
        self.previous_meta = copy.deepcopy(metas[not_replaced_index])
        return images, all_anns, metas
