"""Encoders: ground-truth annotations -> target fields for training.

Runs in data-loader worker processes on numpy arrays (like the reference
``encoder/`` package); output layouts match the loss channel contract:
CIF (F, 5, H, W) [c, x, y, bmin, scale],
CAF (F, 9, H, W) [c, x1, y1, x2, y2, b1, b2, s1, s2].
"""

from .annrescaler import AnnRescaler, AnnRescalerDet, TrackingAnnRescaler
from .cif import Cif
from .caf import Caf
from .cifdet import CifDet
from .single_image import SingleImage
from .tcaf import Tcaf
from .factory import cli, configure
