"""SingleImage encoder adapter (reference ``encoder/single_image.py``):
applies a single-image encoder to element 0 of a pair group."""


class SingleImage:
    def __init__(self, wrapped):
        self.wrapped = wrapped

    def __call__(self, images, anns, metas):
        return self.wrapped(images[0], anns[0], metas[0])

    @property
    def meta(self):
        return self.wrapped.meta
