"""Apply single-image transforms consistently per frame
(reference ``transforms/pair/single_image.py:9-45``).

The reference forks the torch RNG per frame so that both frames see the
same random draws; here the numpy RNG state is captured and restored.
"""

import numpy as np

from ..preprocess import Preprocess


class SingleImage(Preprocess):
    def __init__(self, single_image_op):
        self.single_image_op = single_image_op

    def __call__(self, image_group, anns_group, meta_group):
        out_images, out_anns, out_meta = [], [], []

        # advance the RNG so successive calls differ
        np.random.rand()
        fork_state = np.random.get_state()

        for image, anns, meta in zip(image_group, anns_group, meta_group):
            np.random.set_state(fork_state)
            image, anns, meta = self.single_image_op(image, anns, meta)
            out_images.append(image)
            out_anns.append(anns)
            out_meta.append(meta)

        return out_images, out_anns, out_meta


class Ungroup(Preprocess):
    """Unwrap length-1 groups so eval looks like single-image data."""

    def __call__(self, image_group, anns_group, meta_group):
        assert len(image_group) == 1
        return image_group[0], anns_group[0], meta_group[0]
