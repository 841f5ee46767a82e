"""CifDet decoder wrapper (reference ``decoder/cifdet.py:16-88``)."""

import argparse
import logging
import time
from typing import List

import numpy as np

from .base import Decoder
from .. import headmeta
from ..annotation import AnnotationDet
from ..ops.decode_cifdet import CifDetDecoderConfig, build_cifdet_decoder

LOG = logging.getLogger(__name__)


class CifDet(Decoder):
    iou_threshold = 0.5
    instance_threshold = 0.15
    seed_threshold = 0.2
    cifhr_threshold = 0.3
    nms_by_category = True
    suppression = 0.1
    n_detections = 120

    def __init__(self, head_metas: List[headmeta.CifDet]):
        super().__init__()
        self.metas = head_metas
        self.config = CifDetDecoderConfig(
            iou_threshold=self.iou_threshold,
            seed_threshold=self.seed_threshold,
            cifhr_threshold=self.cifhr_threshold,
            instance_threshold=self.instance_threshold,
            nms_by_category=self.nms_by_category,
            suppression=self.suppression,
            n_detections=self.n_detections,
        )
        self._decoders = {}

    @classmethod
    def cli(cls, parser: argparse.ArgumentParser):
        group = parser.add_argument_group('CifDet decoder')
        group.add_argument('--cifdet-iou-threshold', type=float,
                           default=cls.iou_threshold)

    @classmethod
    def configure(cls, args: argparse.Namespace):
        cls.iou_threshold = args.cifdet_iou_threshold
        # shared decoder thresholds (reference decoder/factory.py:52-82)
        if getattr(args, 'seed_threshold', None) is not None:
            cls.seed_threshold = args.seed_threshold
        if getattr(args, 'instance_threshold', None) is not None:
            cls.instance_threshold = args.instance_threshold

    @classmethod
    def factory(cls, head_metas):
        return [cls([meta]) for meta in head_metas
                if isinstance(meta, headmeta.CifDet)]

    def _decoder(self, stride):
        if stride not in self._decoders:
            self._decoders[stride] = build_cifdet_decoder(
                stride=stride, config=self.config)
        return self._decoders[stride]

    def batch_decode(self, fields_batch):
        cifdet = np.asarray(fields_batch[self.metas[0].head_index],
                            dtype=np.float32)
        start = time.perf_counter()
        out = self._decoder(self.metas[0].stride)(cifdet)
        out = {k: np.asarray(v) for k, v in out.items()}
        self.last_decoder_time = time.perf_counter() - start

        batch_annotations = []
        for i in range(cifdet.shape[0]):
            annotations = []
            order = np.argsort(-out['score'][i])
            for j in order:
                if not out['keep'][i][j]:
                    continue
                box = out['box'][i][j].copy()
                box[2:] -= box[:2]  # xyxy -> xywh
                ann = AnnotationDet(self.metas[0].categories)
                ann.set(int(out['category'][i][j]),
                        float(out['score'][i][j]), box)
                annotations.append(ann)
            batch_annotations.append(annotations)
        return batch_annotations

    def __call__(self, fields):
        return self.batch_decode([f[None] for f in fields])[0]
