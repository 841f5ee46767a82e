"""Random application transforms (reference ``transforms/random.py``)."""

import itertools

import numpy as np

from .preprocess import Preprocess


class RandomApply(Preprocess):
    def __init__(self, transform, probability):
        self.transform = transform
        self.probability = probability

    def __call__(self, image, anns, meta):
        if float(np.random.rand()) > self.probability:
            return image, anns, meta
        return self.transform(image, anns, meta)


class RandomChoice(Preprocess):
    def __init__(self, transforms, probabilities):
        if sum(probabilities) < 1.0 and len(transforms) == len(probabilities):
            transforms = list(transforms) + [None]
        self.transforms = transforms

        probabilities = list(probabilities)
        if len(transforms) == len(probabilities) + 1:
            probabilities.append(1.0 - sum(probabilities))
        assert abs(sum(probabilities) - 1.0) < 1e-6
        assert len(transforms) == len(probabilities)
        self.probabilities = probabilities

    def __call__(self, image, anns, meta):
        rnd = float(np.random.rand())
        for t, p_cumulative in zip(self.transforms,
                                   itertools.accumulate(self.probabilities)):
            if rnd > p_cumulative:
                continue
            if t is None:
                return image, anns, meta
            return t(image, anns, meta)
        return image, anns, meta


class DeterministicEqualChoice(Preprocess):
    """Choose a transform deterministically from meta['image_id'] + salt."""

    def __init__(self, transforms, salt=0):
        self.transforms = transforms
        self.salt = salt

    def __call__(self, image, anns, meta):
        assert meta.get('image_id') is not None
        choice = hash(meta['image_id'] + self.salt) % len(self.transforms)
        t = self.transforms[choice]
        if t is None:
            return image, anns, meta
        return t(image, anns, meta)
