"""Image list datasets for the Predictor (reference ``datasets/image_list.py``)."""

import numpy as np
import PIL.Image


class ImageList:
    def __init__(self, image_paths, preprocess=None, with_raw_image=False):
        self.image_paths = image_paths
        self.preprocess = preprocess
        self.with_raw_image = with_raw_image

    def __getitem__(self, index):
        image_path = self.image_paths[index]
        with open(image_path, 'rb') as f:
            image = PIL.Image.open(f).convert('RGB')

        anns = []
        meta = {'dataset_index': index, 'file_name': image_path}
        processed_image, anns, meta = self.preprocess(image, anns, meta)
        if self.with_raw_image:
            return image, processed_image, anns, meta
        return processed_image, anns, meta

    def __len__(self):
        return len(self.image_paths)


class PilImageList:
    def __init__(self, images, preprocess=None, with_raw_image=False):
        self.images = images
        self.preprocess = preprocess
        self.with_raw_image = with_raw_image

    def __getitem__(self, index):
        image = self.images[index].copy().convert('RGB')
        anns = []
        meta = {'dataset_index': index}
        processed_image, anns, meta = self.preprocess(image, anns, meta)
        if self.with_raw_image:
            return image, processed_image, anns, meta
        return processed_image, anns, meta

    def __len__(self):
        return len(self.images)


class NumpyImageList:
    def __init__(self, images, preprocess=None, with_raw_image=False):
        self.images = images
        self.preprocess = preprocess
        self.with_raw_image = with_raw_image

    def __getitem__(self, index):
        image = PIL.Image.fromarray(np.asarray(self.images[index]))
        anns = []
        meta = {'dataset_index': index}
        processed_image, anns, meta = self.preprocess(image, anns, meta)
        if self.with_raw_image:
            return image, processed_image, anns, meta
        return processed_image, anns, meta

    def __len__(self):
        return len(self.images)
