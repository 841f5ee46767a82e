"""Video stream source (reference ``stream.py:28-157``): OpenCV capture of
webcam/url/file/screen with scale/rotate/crop and start-frame options."""

import logging
import time

import numpy as np
import PIL.Image

try:
    import cv2
except ImportError:
    cv2 = None

LOG = logging.getLogger(__name__)


class Stream:
    def __init__(self, source, *, preprocess=None, scale=1.0, start_frame=None,
                 start_msec=None, crop=None, rotate=None, max_frames=None,
                 with_raw_image=True):
        if cv2 is None:
            raise ImportError('opencv is required for video streams')

        self.source = source
        self.preprocess = preprocess
        self.scale = scale
        self.start_frame = start_frame
        self.start_msec = start_msec
        self.crop = crop
        self.rotate = rotate
        self.max_frames = max_frames
        self.with_raw_image = with_raw_image

        if isinstance(source, str) and source.isdigit():
            self.source = int(source)

    def __iter__(self):
        capture = cv2.VideoCapture(self.source)
        if self.start_frame:
            capture.set(cv2.CAP_PROP_POS_FRAMES, self.start_frame)
        if self.start_msec:
            capture.set(cv2.CAP_PROP_POS_MSEC, self.start_msec)

        frame_i = 0
        while True:
            if self.max_frames is not None and frame_i >= self.max_frames:
                break
            ret, image = capture.read()
            if not ret:
                break
            frame_i += 1

            image = cv2.cvtColor(image, cv2.COLOR_BGR2RGB)
            if self.scale != 1.0:
                image = cv2.resize(image, None,
                                   fx=self.scale, fy=self.scale)
            if self.rotate:
                if self.rotate == 90:
                    image = cv2.rotate(image, cv2.ROTATE_90_COUNTERCLOCKWISE)
                elif self.rotate == 180:
                    image = cv2.rotate(image, cv2.ROTATE_180)
                elif self.rotate == 270:
                    image = cv2.rotate(image, cv2.ROTATE_90_CLOCKWISE)
            if self.crop:
                left, top, right, bottom = self.crop
                image = image[top:image.shape[0] - bottom,
                              left:image.shape[1] - right]

            meta = {
                'frame_i': frame_i,
                'time': time.time(),
                'dataset_index': frame_i,
                'file_name': f'frame-{frame_i:06d}',
            }
            pil_image = PIL.Image.fromarray(image)
            anns = []
            if self.preprocess is not None:
                processed, anns, meta = self.preprocess(pil_image, anns, meta)
            else:
                processed = np.asarray(pil_image)

            if self.with_raw_image:
                yield image, processed, anns, meta
            else:
                yield processed, anns, meta

        capture.release()
