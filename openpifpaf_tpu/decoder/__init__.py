"""Decoders: fields -> annotations.

The heavy lifting happens on device (:mod:`openpifpaf_tpu.ops`); this layer
pairs head metas into decode pipelines, runs the jitted device decoders and
converts fixed-size pose tensors into :class:`~openpifpaf_tpu.annotation.Annotation`
objects.
"""

from .base import Decoder
from .cifcaf import CifCaf, CifCafDense
from .cifdet import CifDet
from .multi import Multi
from .track_annotation import TrackAnnotation
from .track_base import TrackBase
from .tracking_pose import TrackingPose
from .pose_similarity import PoseSimilarity
from . import pose_distance
from . import factory
from .factory import DECODERS
from . import utils
