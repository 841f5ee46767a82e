"""Pose distances for similarity-based tracking
(reference ``decoder/pose_distance/``)."""

from .euclidean import Euclidean
from .oks import Oks
from .crafted import Crafted
