"""Preprocessing transforms (image, anns, meta) -> (image, anns, meta).

Mirrors the reference ``transforms/`` package: geometric ops update both the
annotations and the meta (offset/scale/rotation/valid_area) so that
``Annotation.inverse_transform(meta)`` maps predictions back to the original
image coordinates.
"""

from . import pair
from .preprocess import Preprocess
from .compose import Compose
from .annotations import NormalizeAnnotations, AnnotationJitter
from .scale import RescaleAbsolute, RescaleRelative, ScaleMix
from .pad import CenterPad, CenterPadTight, SquarePad
from .crop import Crop
from .hflip import HFlip
from .image import ImageTransform, Blur, HorizontalBlur, JpegCompression
from .random import RandomApply, RandomChoice, DeterministicEqualChoice
from .rotate import RotateBy90, RotateUniform
from .minsize import MinSize
from .unclipped import UnclippedArea, UnclippedSides
from .toannotations import (ToAnnotations, ToKpAnnotations, ToDetAnnotations,
                            ToCrowdAnnotations)
from .encoders import Encoders
from .misc import Assert, Deinterlace, MultiScale, AddCrowdForIncompleteHead
from .normalize import (EVAL_TRANSFORM, TRAIN_TRANSFORM, NormalizeImage,
                        ToNumpy, IMAGENET_MEAN, IMAGENET_STD,
                        IMAGENET_MEAN_U8)
